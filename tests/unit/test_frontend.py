"""Builtin text front end: normalisation, letter-to-sound, lexicon,
and label-format compatibility with the committed ARPABET question set
(the reference's Festival front-end role, makeLabels.sh)."""

import os

import numpy as np

import idiaptts_tpu
from idiaptts_tpu.data.questions import QuestionSet
from idiaptts_tpu.synth.frontend import (BuiltinFrontEnd, letter_to_sound,
                                         load_lexicon, normalise_text)

ASSET_HED = os.path.join(os.path.dirname(idiaptts_tpu.__file__),
                         "assets", "questions-en-arpabet_dnn.hed")


def test_normalise_text():
    words = normalise_text("Hello, World! It costs 42 dollars.")
    assert "<pau>" in words
    assert "forty" in words and "two" in words
    assert all(w == "<pau>" or w.isalpha() or "'" in w for w in words)


def test_letter_to_sound_rules():
    assert letter_to_sound("ship") == ["sh", "ih", "p"]
    assert letter_to_sound("thing") == ["th", "ih", "ng"]
    assert letter_to_sound("quick") == ["k", "w", "ih", "k"]
    # Silent final e dropped; doubled letters collapsed.
    assert letter_to_sound("lake")[-1] != "eh"
    assert letter_to_sound("ball") == letter_to_sound("bal")


def test_lexicon_lookup(tmp_path):
    lex_file = tmp_path / "lex.dict"
    lex_file.write_text(";;; comment\nHELLO  HH AH0 L OW1\n"
                        "HELLO(2)  HH EH0 L OW1\n")
    lex = load_lexicon(str(lex_file))
    assert lex["hello"] == ["hh", "ah", "l", "ow"]
    fe = BuiltinFrontEnd(lexicon_path=str(lex_file))
    phones = [p for p, _ in fe.text_to_phones("hello")]
    assert phones == ["sil", "hh", "ah", "l", "ow", "sil"]


def test_labels_parse_with_committed_question_set():
    """Every label the front end emits matches a non-trivial question
    vector under the committed full-scale ARPABET .hed."""
    qs = QuestionSet(ASSET_HED)
    assert qs.dict_size >= 250   # full-scale set (416-style coverage)
    fe = BuiltinFrontEnd()
    labels = fe.text_to_full_labels(
        "the quick brown fox jumps over the lazy dog")
    answers = np.stack([qs.match(lab) for lab in labels])
    assert answers.shape == (len(labels), qs.dict_size)
    # Quinphone identity questions fire for every non-boundary phone.
    assert (answers[1:-1].sum(axis=1) > 0).all()
    # Numeric context questions produce varying values.
    assert len(np.unique(answers[:, -1])) > 1 or \
        len(np.unique(answers[:, -2])) > 1


def test_boundary_silences_and_pauses():
    fe = BuiltinFrontEnd()
    phones = [p for p, _ in fe.text_to_phones("one. two")]
    assert phones[0] == "sil" and phones[-1] == "sil"
    assert "pau" in phones
