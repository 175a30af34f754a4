"""Monophone encoder-decoder acoustic model trainer.

Capability parity with
``model_trainers/EncDecMonophoneModelTrainer.py`` (:26-240): monophone
(one-hot) encoder input, duration-derived fixed attention matrix, EOF
gate target appended to the acoustic output (``_add_eof_gate`` :157
role via a separate gate loss), WORLD feature targets.
"""

import logging

import numpy as np

from idiaptts_tpu.data.phonemes import (PhonemeDurationLabelGen,
                                        PhonemeLabelGen)
from idiaptts_tpu.data.world_feat import WorldFeatLabelGen
from idiaptts_tpu.hparams import ExtendedHParams
from idiaptts_tpu.models.enc_dec import EncDecDyn
from idiaptts_tpu.models.losses import NamedLoss
from idiaptts_tpu.train.acoustic import AcousticModelTrainer

logger = logging.getLogger(__name__)


class EncDecMonophoneModelTrainer(AcousticModelTrainer):

    def __init__(self, hparams, id_list, dir_phoneme_labels=None,
                 dir_durations=None, dir_world_features=None,
                 file_symbol_dict=None):
        super().__init__(hparams, id_list,
                         dir_world_features=dir_world_features)
        self.dir_phoneme_labels = dir_phoneme_labels
        self.dir_durations = dir_durations
        self.file_symbol_dict = file_symbol_dict
        self.post_processing_mapping = {"pred_acoustic_features":
                                        "cmp_features"}

    @staticmethod
    def create_hparams(hparams_string=None, verbose=False):
        hparams = AcousticModelTrainer.create_hparams(hparams_string,
                                                      verbose)
        hparams.add_hparams(
            n_frames_per_step=2,
            label_type="mono_no_align",
        )
        return hparams

    def default_data_reader_configs(self, hparams):
        phoneme_config = PhonemeLabelGen.Config(
            name="phonemes", directory=self.dir_phoneme_labels,
            file_symbol_dict=self.file_symbol_dict,
            label_type=hparams.get("label_type", "mono_no_align"),
            one_hot=True)
        attention_config = PhonemeDurationLabelGen.Config(
            name="attention_matrix", directory=self.dir_durations,
            load_as_matrix=True, match_length=("acoustic_features",))
        output_config = WorldFeatLabelGen.Config(
            name="cmp_features", output_names=("acoustic_features",),
            directory=self.dir_world_features,
            add_deltas=hparams.get("add_deltas", True),
            num_coded_sps=hparams.get("num_coded_sps", 60),
            sp_type=hparams.get("sp_type", "mcep"),
            match_length=("attention_matrix",))
        return [phoneme_config, attention_config, output_config]

    def default_model_config(self, hparams, dim_in, dim_out):
        return EncDecDyn.Config(
            input_names=("phonemes",),
            output_names=("pred_acoustic_features", "pred_gate"),
            encoder_units=(256, 256), out_dim=dim_out,
            n_frames_per_step=hparams.get("n_frames_per_step", 2),
            attention_name="attention_matrix",
            target_name="acoustic_features")

    def default_loss_configs(self, hparams):
        return [
            NamedLoss.Config(
                "mse", "MSELoss",
                ("pred_acoustic_features", "acoustic_features"),
                seq_mask="_seq_mask:acoustic_features",
                reduction="mean_per_frame"),
            NamedLoss.Config(
                "gate", "BCELoss", ("pred_gate", "gate_target"),
                seq_mask="_seq_mask:gate_target", reduction="mean",
                loss_weight=hparams.get("gate_loss_weight", 1.0)
                if "gate_loss_weight" in hparams else 1.0),
        ]

    def init(self, hparams, model_config=None, loss_configs=None,
             data_reader_configs=None):
        if data_reader_configs is None:
            data_reader_configs = self.default_data_reader_configs(
                hparams)
        self.data_reader_configs = data_reader_configs
        self._setup_datareaders(hparams)
        self._setup_datasets(hparams)
        # Gate target: 1 at the final frame of each utterance.
        for dataset in (self.dataset_train, self.dataset_val,
                        self.dataset_test):
            if dataset is not None:
                _attach_gate_target(dataset)
        if model_config is None:
            example = self._example_batch(hparams)
            dim_in = example["phonemes"].shape[-1]
            dim_out = example["acoustic_features"].shape[-1]
            model_config = self.default_model_config(hparams, dim_in,
                                                     dim_out)
        if loss_configs is None:
            loss_configs = self.default_loss_configs(hparams)
        from idiaptts_tpu.train.trainer import ModularTrainer
        # Datasets (with the gate wrapper) are already set up above —
        # pass None so the base init does not rebuild them.
        return ModularTrainer.init(self, hparams, model_config,
                                   loss_configs, None)


def _attach_gate_target(dataset):
    """Wrap get_id_name to append an EOF gate target
    (EncDecMonophoneModelTrainer._add_eof_gate :157 role)."""
    original = dataset.get_id_name

    def with_gate(id_name):
        output, ds = original(id_name)
        if "acoustic_features" in output:
            T = len(output["acoustic_features"])
            gate = np.zeros((T, 1), np.float32)
            gate[-1] = 1.0
            output["gate_target"] = gate
        return output, ds

    dataset.get_id_name = with_gate
