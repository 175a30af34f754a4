"""Regenerate test fixtures from wav files with the TPU extractors.

Role of the reference's ``test/integration/fixtures/create_fixtures.py``
(feature re-extraction; flags at :30-32): given a directory of wavs and
HTK state-aligned labels, rebuilds WORLD feature streams (+cmp stats),
question labels, durations, and optionally a tiny pre-trained fixture
model — everything the integration tests consume.

Usage:
  python tools/create_fixtures.py --dir_wav WAV --dir_labels LAB \
      --file_questions Q.hed --dir_out OUT [--num_coded_sps 20]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dir_wav", required=True)
    parser.add_argument("--dir_labels", required=True,
                        help="HTK state-aligned labels")
    parser.add_argument("--file_questions", required=True)
    parser.add_argument("--dir_out", required=True)
    parser.add_argument("--num_coded_sps", type=int, default=20)
    parser.add_argument("--id_list", default=None)
    parser.add_argument("--train_fixture_model", action="store_true")
    args = parser.parse_args()

    from idiaptts_tpu.data.phonemes import PhonemeDurationLabelGen
    from idiaptts_tpu.data.questions import QuestionLabelGen
    from idiaptts_tpu.data.world_feat import WorldFeatLabelGen

    id_list = None
    if args.id_list:
        with open(args.id_list) as f:
            id_list = [line.strip() for line in f if line.strip()]

    dir_world = os.path.join(args.dir_out, "WORLD")
    logging.info("Extracting WORLD features (no deltas).")
    gen = WorldFeatLabelGen(dir_labels=dir_world, add_deltas=False,
                            num_coded_sps=args.num_coded_sps)
    gen.gen_data(args.dir_wav, dir_out=dir_world, id_list=id_list)
    logging.info("Extracting WORLD features (with deltas + cmp stats).")
    gen_d = WorldFeatLabelGen(dir_labels=dir_world, add_deltas=True,
                              num_coded_sps=args.num_coded_sps)
    gen_d.gen_data(args.dir_wav, dir_out=dir_world, id_list=id_list)

    logging.info("Generating question labels.")
    QuestionLabelGen.gen_data(
        args.dir_labels, args.file_questions,
        dir_out=os.path.join(args.dir_out, "questions"),
        id_list=id_list)

    logging.info("Extracting durations.")
    PhonemeDurationLabelGen.gen_data(
        args.dir_labels, dir_out=os.path.join(args.dir_out, "dur"),
        id_list=id_list)

    if args.train_fixture_model:
        logging.info("Training the tiny fixture acoustic model.")
        from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
        from idiaptts_tpu.train.acoustic import AcousticModelTrainer
        hparams = AcousticModelTrainer.create_hparams()
        hparams.num_coded_sps = args.num_coded_sps
        hparams.out_dir = args.dir_out
        hparams.model_name = "test_model"
        hparams.epochs = 3
        hparams.batch_size_train = 2
        hparams.seed = 1
        hparams.test_set_perc = 0.0
        hparams.val_set_perc = 0.3
        trainer = AcousticModelTrainer(
            hparams, id_list or [],
            dir_question_labels=os.path.join(args.dir_out, "questions"),
            dir_world_features=dir_world)
        trainer.init(hparams)
        trainer.train(hparams)
    logging.info("Fixtures written to %s", args.dir_out)


if __name__ == "__main__":
    main()
