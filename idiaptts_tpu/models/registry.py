"""Model identifier registry.

Capability parity with the legacy ``pytorch/ModelFactory.py`` (~120 LoC
identifier->class registry for legacy model strings): maps a model-type
identifier (``RNNDYN-...`` strings, ``NeuralFilters``, ``WaveNet``,
``EncDecDyn``...) to a config builder, so hparams-driven recipes can
create models by name.
"""

from idiaptts_tpu.models.rnn_dyn import IDENTIFIER as RNNDYN_IDENTIFIER
from idiaptts_tpu.models.rnn_dyn import convert_legacy_string

_REGISTRY = {}


def register(identifier):
    def deco(builder):
        _REGISTRY[identifier] = builder
        return builder
    return deco


def create_model_config(model_type, in_dim, out_dim=None, hparams=None):
    """Model-type string -> ModelConfig (ModelFactory.create role)."""
    if model_type.upper().startswith(RNNDYN_IDENTIFIER):
        return convert_legacy_string(model_type, in_dim,
                                     hparams=hparams)
    if model_type in _REGISTRY:
        return _REGISTRY[model_type](in_dim, out_dim, hparams)
    raise NotImplementedError(
        "Unknown model type: {}".format(model_type))


@register("WaveNet")
def _wavenet(in_dim, out_dim, hparams):
    from idiaptts_tpu.models.wavenet import WaveNetWrapper
    return WaveNetWrapper.Config(
        input_names=("cond_features",), output_names=("pred_logits",),
        out_channels=out_dim or 256)


@register("EncDecDyn")
def _enc_dec(in_dim, out_dim, hparams):
    from idiaptts_tpu.models.enc_dec import EncDecDyn
    return EncDecDyn.Config(input_names=("phonemes",),
                            output_names=("pred_acoustic_features",
                                          "pred_gate"),
                            out_dim=out_dim)
