"""HTS question engine tests: BIT-EXACT parity with the reference's
committed fixture ``.questions`` files plus unit checks of the pattern
compiler and subphone feature variants."""

import os

import numpy as np
import pytest

from idiaptts_tpu.data.questions import (HTSLabelNormalisation,
                                         QuestionLabelGen,
                                         wildcards2regex)


def test_wildcards2regex():
    import re
    r = wildcards2regex("*-aa+*")
    assert re.search(r, "xx~xx-aa+b=c")
    assert not re.search(r, "xx~xx-ab+b=c")
    # No wildcard: search anywhere, no anchors.
    r2 = wildcards2regex("-aa+")
    assert re.search(r2, "x-aa+y")
    # Anchored start when no leading '*'.
    r3 = wildcards2regex("aa+*")
    assert re.search(r3, "aa+rest")
    assert not re.search(r3, "baa+rest")
    # Number pattern conversion.
    r4 = wildcards2regex("*/A/(\\d+)_*", convert_number_pattern=True)
    m = re.search(r4, "foo/A/42_0_0/B/")
    assert m and m.group(1) == "42"


@pytest.mark.parametrize("utt", ["LJ001-0001", "LJ001-0002"])
def test_bit_exact_vs_reference_questions(ref_fixtures_dir, utt):
    """The full frame-level question matrix equals the reference's
    committed Merlin output exactly (409 dims: 400 questions + 9
    subphone features) — this exercises the NATIVE C++ matcher by
    default."""
    label_dict, vmin, vmax = QuestionLabelGen.gen_data(
        os.path.join(ref_fixtures_dir, "labels", "label_state_align"),
        os.path.join(ref_fixtures_dir, "questions-en-radio_dnn_400.hed"),
        dir_out=None, id_list=[utt], return_dict=True)
    mine = label_dict[utt]
    ref = np.fromfile(os.path.join(ref_fixtures_dir, "questions",
                                   utt + ".questions"),
                      np.float32).reshape(-1, 409)
    assert mine.shape == ref.shape
    np.testing.assert_array_equal(mine, ref)


def test_bit_exact_vs_committed_corpus_questions(fixtures_dir, id_list,
                                                 question_file,
                                                 num_questions):
    """Self-contained regression pin: regenerating the corpus question
    matrices reproduces the committed fixture files bit-exactly."""
    label_dict, vmin, vmax = QuestionLabelGen.gen_data(
        os.path.join(fixtures_dir, "labels", "label_state_align"),
        question_file, dir_out=None, id_list=id_list[:3],
        return_dict=True)
    for utt in id_list[:3]:
        ref = np.fromfile(os.path.join(fixtures_dir, "questions",
                                       utt + ".questions"),
                          np.float32).reshape(-1, num_questions)
        np.testing.assert_array_equal(label_dict[utt], ref)


def test_subphone_feature_variants(fixtures_dir, uid, question_file,
                                   num_questions):
    lab = os.path.join(fixtures_dir, "labels", "label_state_align",
                       uid + ".lab")
    base = num_questions - 9
    for feats, extra in [("full", 9), ("state_only", 1),
                         ("frame_only", 1), ("minimal_frame", 2),
                         ("coarse_coding", 4)]:
        op = HTSLabelNormalisation(question_file, subphone_feats=feats)
        out = op.load_labels_with_state_alignment(lab)
        assert out.shape[1] == base + extra, feats


def test_phone_alignment_loader(fixtures_dir, uid, question_file,
                                num_questions, tmp_path):
    """load_labels_with_phone_alignment
    (label_normalisation.py:424-521): phone-aligned labels (built here
    by merging the fixture's state timings per phone) produce the same
    per-frame question columns as the state-aligned loader, with the
    phone-level subphone feature variants."""
    lab = os.path.join(fixtures_dir, "labels", "label_state_align",
                       uid + ".lab")
    # Merge the 5 state lines of each phone into one phone line.
    phones = []
    with open(lab) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            start, end, label = int(parts[0]), int(parts[1]), parts[2]
            state = int(label[-2])
            if state == 2:
                phones.append([start, end, label[:-3]])
            else:
                phones[-1][1] = end
    phone_lab = tmp_path / (uid + ".lab")
    phone_lab.write_text("".join(
        "{} {} {}\n".format(*p) for p in phones))

    base = num_questions - 9
    for feats, extra in [("minimal_phoneme", 3), ("coarse_coding", 4),
                         ("none", 0)]:
        op = HTSLabelNormalisation(question_file, subphone_feats=feats)
        out = op.load_labels_with_phone_alignment(str(phone_lab))
        assert out.shape[1] == base + extra, feats
    # Question columns match the state-aligned expansion frame-by-frame
    # (state timings already align to 5 ms frames in the fixtures).
    op_phone = HTSLabelNormalisation(question_file,
                                     subphone_feats="coarse_coding")
    op_state = HTSLabelNormalisation(question_file,
                                     subphone_feats="coarse_coding")
    out_phone = op_phone.load_labels_with_phone_alignment(
        str(phone_lab))
    out_state = op_state.load_labels_with_state_alignment(lab)
    assert out_phone.shape == out_state.shape
    np.testing.assert_array_equal(out_phone[:, :base],
                                  out_state[:, :base])
    # Phone-duration column agrees with the state loader's.
    np.testing.assert_array_equal(out_phone[:, base + 3],
                                  out_state[:, base + 3])
    # Manual durations override the timings.
    durs = [3] * len(phones)
    op_none = HTSLabelNormalisation(question_file,
                                    subphone_feats="none")
    out_dur = op_none.load_labels_with_phone_alignment(
        str(phone_lab), durations=durs)
    assert len(out_dur) == 3 * len(phones)
    # Label-only lines (no timings) + explicit durations — the
    # synthesis use case — expand per the durations sequence.
    bare_lab = phone_lab.parent / ("bare_" + phone_lab.name)
    bare_lab.write_text("".join(p[2] + "\n" for p in phones))
    op_cc = HTSLabelNormalisation(question_file,
                                  subphone_feats="coarse_coding")
    out_bare = op_cc.load_labels_with_phone_alignment(
        str(bare_lab), durations=durs)
    assert len(out_bare) == 3 * len(phones)
    # State-based subphone feats are rejected for phone alignment.
    op_full = HTSLabelNormalisation(question_file,
                                    subphone_feats="full")
    with pytest.raises(ValueError):
        op_full.load_labels_with_phone_alignment(str(phone_lab))


def test_question_reader_with_minmax_norm(fixtures_dir, uid,
                                          num_questions):
    config = QuestionLabelGen.Config(
        name="questions",
        directory=os.path.join(fixtures_dir, "questions"),
        num_questions=num_questions)
    reader = config.create_reader()
    sample = reader[uid]["questions"]
    # Min-max normalised to [0, 1] (state index 5 -> 1.0 etc.).
    assert sample.min() >= -1e-6
    assert sample.max() <= 1.0 + 1e-6
    denorm = reader.postprocess_sample(sample)
    ref = np.fromfile(os.path.join(fixtures_dir, "questions",
                                   uid + ".questions"),
                      np.float32).reshape(-1, num_questions)
    np.testing.assert_allclose(denorm, ref, atol=1e-4)


def test_make_question_file_tool(tmp_path):
    """tools/make_question_file.py generates a parseable QS/CQS set
    (the shipped-question-file role of the reference's
    scripts/tts_frontend/questions/*.hed assets)."""
    import subprocess
    import sys
    out = tmp_path / "q.hed"
    subprocess.run([sys.executable, "tools/make_question_file.py",
                    "--phone_set", "arpabet", "--out", str(out)],
                   check=True, cwd="/root/repo")
    from idiaptts_tpu.data.questions import QuestionSet
    qs = QuestionSet(str(out))
    assert qs.dict_size > 200
    answers = qs.match("sil~hh-ah+l=ow:1_5/A/v_vowel/B/1-3/J/5+2-1")
    assert (answers != 0).sum() >= 5


@pytest.mark.parametrize("asset,size", [
    ("questions-en-radio_dnn_416.hed", 416),
    ("questions-en-unilex_dnn_600.hed", 600),
])
def test_shipped_reference_question_sets(fixtures_dir, asset, size):
    """The reference's shipped question-set assets
    (scripts/tts_frontend/questions/questions-en-radio_dnn_416.hed and
    questions-en-unilex_dnn_600.hed) are committed under
    idiaptts_tpu/assets/ and load through the question engine: correct
    dimensionality, and real (non-trivial) activations on the fixture
    corpus labels — so reference recipes keyed to these files port
    unchanged."""
    from idiaptts_tpu.data.questions import QuestionSet
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "..", "idiaptts_tpu", "assets", asset)
    qs = QuestionSet(path)
    assert qs.dict_size == size
    lab_dir = os.path.join(fixtures_dir, "labels", "label_state_align")
    lab_file = sorted(os.listdir(lab_dir))[0]
    with open(os.path.join(lab_dir, lab_file)) as f:
        labels = [line.split()[-1] for line in f if line.strip()]
    answers = np.stack([qs.match(lab) for lab in labels])
    assert answers.shape == (len(labels), size)
    # Every phone label activates some questions; the set as a whole
    # activates many distinct ones (radio phone set matches the
    # fixture corpus; unilex shares the positional/CQS questions).
    assert (answers != 0).any(axis=1).all()
    assert (answers != 0).any(axis=0).sum() > 50
    # Full frame-level extraction (questions + 9 subphone features)
    # runs through the standard gen_data path at the right width.
    label_dict, _, _ = QuestionLabelGen.gen_data(
        lab_dir, path, dir_out=None,
        id_list=[lab_file.rsplit(".", 1)[0]], return_dict=True)
    mat = next(iter(label_dict.values()))
    assert mat.shape[1] == size + 9
