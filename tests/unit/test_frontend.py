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


def test_structured_labels_cqs_semantics():
    """The enriched label format carries real structure: stress from
    the lexicon, syllable/word/phrase positions and utterance totals
    extracted by the committed CQS block (the reference's
    questions-en-radio_dnn_416 numeric-context dimensions)."""
    qs = QuestionSet(ASSET_HED)
    keys = [k.strip('"') for k, _ in qs.raw_continuous]
    fe = BuiltinFrontEnd()
    # Two phrases: "hello world. again" -> phrase 1 = 2 words.
    labels = fe.text_to_full_labels("hello world. again")
    vecs = np.stack([qs.match(lab) for lab in labels])

    base = len(qs.raw_binary)
    def cqs(name):
        return vecs[:, base + keys.index(name)]

    assert cqs("Num-Phrases_in_Utterance").max() == 2
    assert cqs("Num-Words_in_Utterance").max() == 3
    # LTS fallback stresses the first syllable of unknown words; CMU
    # convention: silence rows carry 0.
    assert set(np.unique(cqs("C-Syl_Stress"))) <= {0.0, 1.0, 2.0}
    assert cqs("C-Syl_Stress").max() >= 1
    # Phrase 1 has two words: fw positions reach 2.
    assert cqs("Pos_C-Word_in_C-Phrase(Fw)").max() == 2
    # Utterance syllable total is constant on non-silence rows.
    ns = cqs("Num-Syls_in_Utterance")
    assert ns.max() == ns[1:-1].max() and ns.max() >= 3


def test_syllabify():
    from idiaptts_tpu.synth.frontend import syllabify
    # wa-ter: single intervocalic consonant starts the next syllable.
    syls = syllabify([("w", None), ("ao", 1), ("t", None),
                      ("er", 0)])
    assert [s["phones"] for s in syls] == [["w", "ao"], ["t", "er"]]
    assert [s["stress"] for s in syls] == [1, 0]
    # win-ter: cluster splits evenly.
    syls = syllabify([("w", None), ("ih", 1), ("n", None),
                      ("t", None), ("er", 0)])
    assert [s["phones"] for s in syls] == [["w", "ih", "n"],
                                           ["t", "er"]]
    # no vowel -> one unstressed syllable.
    assert syllabify([("s", None)]) == [{"phones": ["s"],
                                         "stress": 0}]


def test_normalise_text_rich_cases():
    """Abbreviations, currency, percent, ordinals, years and decimals
    expand to speakable words (the normalisation Festival performed for
    the reference's front end)."""
    from idiaptts_tpu.synth.frontend import normalise_text

    assert normalise_text("Dr. Smith lives on St. James")[:2] == [
        "doctor", "smith"]
    assert "saint" in normalise_text("St. James")
    out = normalise_text("It costs $5.50 today")
    assert "five" in out and "dollars" in out and "fifty" in out \
        and "cents" in out
    assert normalise_text("$1")[0:2] == ["one", "dollar"]
    assert normalise_text("50%") == ["fifty", "percent"]
    assert normalise_text("the 3rd time") == ["the", "third", "time"]
    assert normalise_text("the 22nd") == ["the", "twenty", "second"]
    assert normalise_text("in 1984") == ["in", "nineteen", "eighty",
                                         "four"]
    assert normalise_text("in 1901") == ["in", "nineteen", "oh", "one"]
    # The plain word "no" at sentence end stays "no".
    assert normalise_text("She said no.")[:3] == ["she", "said", "no"]
    assert normalise_text("by 2025") == ["by", "twenty", "twenty",
                                         "five"]
    # Round years read as cardinals.
    assert normalise_text("in 1900") == ["in", "nineteen", "hundred"]
    assert normalise_text("pi is 3.14") == ["pi", "is", "three",
                                            "point", "one", "four"]
    assert normalise_text("1,234 items")[:4] == ["one", "thousand",
                                                 "two", "hundred"]
    # Punctuation still maps to pauses.
    assert "<pau>" in normalise_text("Hello. World")


def test_accent_en_gb_non_rhoticity_and_bath():
    """The en-GB accent variant (the builtin counterpart of the
    reference's Festival Am vs unilex-Br front-end choice,
    Text2FestivalReadyAm.pl / utt2lab-unilex-rpx.sh) drops
    non-prevocalic /r/ and applies the TRAP-BATH split, on the same
    ARPABET inventory the committed question sets cover."""
    from idiaptts_tpu.synth.frontend import BuiltinFrontEnd

    us = BuiltinFrontEnd(accent="en-US")
    gb = BuiltinFrontEnd(accent="en-GB")

    def phones(fe, text):
        return [p for p, _ in fe.text_to_phones(text) if p != "sil"]

    # Coda r drops in GB, survives in US ("car", "park").
    assert "r" in phones(us, "car park")
    assert "r" not in phones(gb, "car park")
    # Onset r survives in both ("red").
    assert "r" in phones(gb, "red")
    # Intervocalic r (vowel follows) survives: "very".
    assert "r" in phones(gb, "very")
    # TRAP-BATH: ae -> aa before voiceless fricative / nasal+cons.
    assert "aa" in phones(gb, "bath") and "ae" not in phones(gb, "bath")
    assert "ae" in phones(us, "bath")
    assert "aa" in phones(gb, "dance")
    # TRAP stays TRAP elsewhere ("cat").
    assert "ae" in phones(gb, "cat")
    # Unstressed word-final "er" centralises to ax ("water").
    assert "ax" in phones(gb, "water") and "er" not in phones(gb, "water")
    assert "er" in phones(us, "water")


def test_accent_en_gb_bath_trap_against_rp_ground_truth():
    """The TRAP-BATH split is lexical (Wells' BATH lexical set), so the
    mapping is checked against dictionary RP classifications, not its
    own rules: every word below has an uncontested RP vowel (OED /
    Wells LPD).  Regression for the round-4 advisor finding that a
    blanket phonetic rule broadened frequent TRAP words ("hand" ->
    /aa/, "gas" -> /aa/, "romantic" -> /aa/)."""
    from idiaptts_tpu.synth.frontend import to_received_pronunciation

    def gb(word, us_phones):
        entry = [(p, 1 if p in ("ae", "aa") else None)
                 for p in us_phones]
        return [p for p, _ in to_received_pronunciation(entry,
                                                        word=word)]

    # BATH set: RP has /ɑː/.
    for word, us in [("bath", ["b", "ae", "th"]),
                     ("pass", ["p", "ae", "s"]),
                     ("passed", ["p", "ae", "s", "t"]),
                     ("classes", ["k", "l", "ae", "s", "ih", "z"]),
                     ("dance", ["d", "ae", "n", "s"]),
                     ("dancing", ["d", "ae", "n", "s", "ih", "ng"]),
                     ("plant", ["p", "l", "ae", "n", "t"]),
                     ("branch", ["b", "r", "ae", "n", "ch"]),
                     ("answer", ["ae", "n", "s", "er"]),
                     ("example", ["ih", "g", "z", "ae", "m", "p",
                                  "ax", "l"]),
                     ("laughing", ["l", "ae", "f", "ih", "ng"]),
                     ("master", ["m", "ae", "s", "t", "er"]),
                     ("afternoon", ["ae", "f", "t", "er", "n", "uw",
                                    "n"])]:
        assert "aa" in gb(word, us) and "ae" not in gb(word, us), word

    # TRAP set: RP keeps /æ/ (the advisor's misfire cases first).
    for word, us in [("hand", ["hh", "ae", "n", "d"]),
                     ("stand", ["s", "t", "ae", "n", "d"]),
                     ("gas", ["g", "ae", "s"]),
                     ("romantic", ["r", "ow", "m", "ae", "n", "t",
                                   "ih", "k"]),
                     ("fancy", ["f", "ae", "n", "s", "iy"]),
                     ("band", ["b", "ae", "n", "d"]),
                     ("stamp", ["s", "t", "ae", "m", "p"]),
                     ("classic", ["k", "l", "ae", "s", "ih", "k"]),
                     ("massive", ["m", "ae", "s", "ih", "v"]),
                     ("passenger", ["p", "ae", "s", "ax", "n", "jh",
                                    "er"]),
                     ("fantastic", ["f", "ae", "n", "t", "ae", "s",
                                    "t", "ih", "k"]),
                     ("plastic", ["p", "l", "ae", "s", "t", "ih",
                                  "k"]),
                     ("random", ["r", "ae", "n", "d", "ax", "m"]),
                     ("maths", ["m", "ae", "th", "s"])]:
        assert "ae" in gb(word, us) and "aa" not in gb(word, us), word


def test_accent_en_gb_rhoticity_edge_cases():
    """Advisor regression: non-prevocalic /r/ drops even after a
    consonant, and '-er' with SECONDARY stress still centralises (only
    primary-stressed NURSE keeps 'er')."""
    from idiaptts_tpu.synth.frontend import to_received_pronunciation

    # r after consonant, before consonant: still dropped.
    out = [p for p, _ in to_received_pronunciation(
        [("hh", None), ("er", 0), ("r", None), ("z", None)],
        word="hers")]
    assert "r" not in out
    # Secondary-stressed word-final er centralises ("understudy"-style
    # compounds) — primary-stressed NURSE 'er' survives ("prefer").
    out = [p for p, _ in to_received_pronunciation(
        [("l", None), ("ae", 1), ("n", None), ("d", None),
         ("ow", None), ("n", None), ("er", 2)], word="landowner")]
    assert out[-1] == "ax"
    out = [p for p, _ in to_received_pronunciation(
        [("p", None), ("r", None), ("ih", 0), ("f", None), ("er", 1)],
        word="prefer")]
    assert out[-1] == "er"
    # Onset r before a vowel is untouched ("prefer" keeps its r).
    assert "r" in out


def test_accent_unknown_rejected_and_labels_still_parse(tmp_path):
    """Unknown accents fail fast; GB labels stay compatible with the
    committed question set (same phone inventory)."""
    import numpy as np
    import pytest

    from idiaptts_tpu.synth.frontend import BuiltinFrontEnd

    with pytest.raises(ValueError):
        BuiltinFrontEnd(accent="fr-FR")

    gb = BuiltinFrontEnd(accent="en-GB")
    labels = gb.text_to_full_labels("The bath near the car.")
    qs = QuestionSet(ASSET_HED)
    answers = np.stack([qs.match(lab) for lab in labels])
    assert answers.shape == (len(labels), qs.dict_size)
    assert (answers[1:-1].sum(axis=1) > 0).all()
    assert np.isfinite(answers).all()
    # write_labels still produces parseable .lab files under GB.
    ids = gb.write_labels(["The bath near the car."], str(tmp_path))
    assert len(ids) == 1
