"""Helpers shared by the egs recipes (question-file discovery, the
question-vector width convention, and the WORLD extraction stage)."""

import glob
import logging
import os

logger = logging.getLogger(__name__)

#: questions = answered QS/CQS entries + 9 frame-position features
#: (QuestionLabelGen layout; see idiaptts_tpu/data/questions.py).
NUM_SUBPHONE_FEATS = 9


def question_file(fixtures_dir):
    heds = sorted(glob.glob(os.path.join(fixtures_dir, "*.hed")))
    if not heds:
        raise FileNotFoundError("no .hed question file in "
                                + fixtures_dir)
    return heds[0]


def num_questions(fixtures_dir):
    from idiaptts_tpu.data.questions import QuestionSet
    return (QuestionSet(question_file(fixtures_dir)).dict_size
            + NUM_SUBPHONE_FEATS)


def stage_world(fixtures_dir, work_dir, ids, num_coded_sps):
    """Extract WORLD features (+cmp/stats) into <work_dir>/WORLD."""
    from idiaptts_tpu.data.world_feat import WorldFeatLabelGen
    dir_world = os.path.join(work_dir, "WORLD")
    gen = WorldFeatLabelGen(dir_labels=dir_world, add_deltas=True,
                            num_coded_sps=num_coded_sps)
    gen.gen_data(os.path.join(fixtures_dir, "database", "wav"),
                 dir_out=dir_world, id_list=ids)
    logger.info("WORLD features in %s", dir_world)
    return dir_world


def run_stages(stages, args, *extra):
    """Kaldi-style --stage/--stop_stage loop with range validation."""
    lo, hi = min(stages), max(stages)
    if args.stage not in stages or args.stop_stage not in stages:
        raise SystemExit("--stage/--stop_stage must be in %d..%d (got "
                         "%d..%d)" % (lo, hi, args.stage,
                                      args.stop_stage))
    for n in range(args.stage, args.stop_stage + 1):
        logger.info("===== stage %d =====", n)
        stages[n](args, *extra)
