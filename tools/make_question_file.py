#!/usr/bin/env python
"""Generate an HTS question file (.hed) for a phone set.

Role parity with the reference's shipped front-end assets
(``scripts/tts_frontend/questions/questions-en-radio_dnn_416.hed`` /
``questions-en-unilex_dnn_600.hed``): those files are Festival-derived
config data; this tool generates an equivalent QS/CQS question set for
ANY phone inventory so the framework is usable without copying
Festival assets.

Question structure (HTS-standard label format
``ll~l-c+r=rr:...`` with /A .. /J context blocks):

* QS per phone at the five quinphone positions (LL, L, C, R, RR),
* QS per phonetic class (vowel, nasal, fricative, plosive, liquid,
  silence, voiced) at the C position — classes come from a class map
  file or the built-in ARPABET preset,
* CQS numeric context questions (position in phrase fw/bw, syllable
  index, word length, phone count).

Usage:
  python tools/make_question_file.py --phone_set arpabet \
      --out questions-en-arpabet_dnn.hed
  python tools/make_question_file.py --phone_list my_phones.txt \
      --class_map my_classes.tsv --out questions-custom.hed

``--phone_list``: one phone per line (e.g. ``labels/mono_phone.list``).
``--class_map``: lines of ``<phone>\t<class>[,voiced]``.
"""

import argparse

# ARPABET inventory with phonetic classes (public phone set).
ARPABET = {
    "aa": ("vowel", True), "ae": ("vowel", True), "ah": ("vowel", True),
    "ao": ("vowel", True), "aw": ("vowel", True), "ax": ("vowel", True),
    "ay": ("vowel", True), "eh": ("vowel", True), "er": ("vowel", True),
    "ey": ("vowel", True), "ih": ("vowel", True), "iy": ("vowel", True),
    "ow": ("vowel", True), "oy": ("vowel", True), "uh": ("vowel", True),
    "uw": ("vowel", True),
    "b": ("plosive", True), "d": ("plosive", True), "g": ("plosive", True),
    "p": ("plosive", False), "t": ("plosive", False),
    "k": ("plosive", False),
    "ch": ("affricate", False), "jh": ("affricate", True),
    "dh": ("fricative", True), "f": ("fricative", False),
    "s": ("fricative", False), "sh": ("fricative", False),
    "th": ("fricative", False), "v": ("fricative", True),
    "z": ("fricative", True), "zh": ("fricative", True),
    "hh": ("fricative", False),
    "m": ("nasal", True), "n": ("nasal", True), "ng": ("nasal", True),
    "l": ("liquid", True), "r": ("liquid", True), "w": ("liquid", True),
    "y": ("liquid", True),
    "sil": ("silence", False), "pau": ("silence", False),
    "sp": ("silence", False),
}

POSITION_PATTERNS = {
    "LL": "{p}~*", "L": "*~{p}-*", "C": "*-{p}+*",
    "R": "*+{p}=*", "RR": "*={p}:*"}

# CQS for the BuiltinFrontEnd label format (synth/frontend.py
# text_to_full_labels):
#   ll~l-c+r=rr:PF_PB/A/vc_cls/B/S!SF-SB@SP/C/WS_WF-WB/D/PW=PF+PB
#   /E/EB&EA/J/NS~NW+NP-WI
# Each pattern's delimiter pair is unique within the label, so the
# first regex match is THE field.  This covers the numeric-context
# dimensions of the reference's questions-en-radio_dnn_416.hed CQS
# block (segment position, syllable stress/position/size, word
# size/position, phrase size/position, stressed-syllable counts,
# utterance totals) on the framework's label syntax.
CQS_QUESTIONS = [
    ("Pos_C-Phone_Fw", r":(\d+)_"),
    ("Pos_C-Phone_Bw", r"_(\d+)/A/"),
    ("C-Syl_Stress", r"/B/(\d+)!"),
    ("Pos_C-Syl_in_C-Word(Fw)", r"!(\d+)-"),
    ("Pos_C-Syl_in_C-Word(Bw)", r"-(\d+)@"),
    ("C-Syl_Num-Phones", r"@(\d+)/C/"),
    ("C-Word_Num-Syls", r"/C/(\d+)_"),
    ("Pos_C-Word_in_C-Phrase(Fw)", r"_(\d+)-"),
    ("Pos_C-Word_in_C-Phrase(Bw)", r"-(\d+)/D/"),
    ("C-Phrase_Num-Words", r"/D/(\d+)="),
    ("Pos_C-Phrase_in_Utterance(Fw)", r"=(\d+)+"),
    ("Pos_C-Phrase_in_Utterance(Bw)", r"+(\d+)/E/"),
    ("Num-StressedSyl_before_C-Syl_in_C-Phrase", r"/E/(\d+)&"),
    ("Num-StressedSyl_after_C-Syl_in_C-Phrase", r"&(\d+)/J/"),
    ("Num-Syls_in_Utterance", r"/J/(\d+)~"),
    ("Num-Words_in_Utterance", r"~(\d+)+"),
    ("Num-Phrases_in_Utterance", r"+(\d+)-"),
]

# A pattern without a trailing ``*`` is end-anchored by
# wildcards2regex, which pins Word_Idx to the final ``-<idx>`` field.
RICH_CQS_QUESTIONS = CQS_QUESTIONS + [
    ("Word_Idx", r"*-(\d+)"),
]

# Binary structural questions (reference ships e.g. stress/accent
# binaries alongside the continuous block).
STRUCT_QS = [
    ("C-Syl_Stressed", ["*/B/1!*", "*/B/2!*"]),
    ("C-Syl_Primary-Stress", ["*/B/1!*"]),
    ("C-Syl_Secondary-Stress", ["*/B/2!*"]),
    ("C-Word_Monosyllabic", ["*/C/1_*"]),
    ("C-Phrase_Single-Word", ["*/D/1=*"]),
]

# Vowel articulatory features over ARPABET (public phonetics): used by
# --rich to reach the reference's full-scale question-file coverage
# (questions-en-radio_dnn_416.hed ships ~416 questions).
VOWEL_FEATURES = {
    "front": ["iy", "ih", "eh", "ae", "ey"],
    "central": ["ah", "ax", "er"],
    "back": ["aa", "ao", "ow", "uh", "uw"],
    "high": ["iy", "ih", "uh", "uw"],
    "mid": ["eh", "ah", "ax", "er", "ey", "ow"],
    "low": ["aa", "ae", "ao", "aw", "ay"],
    "rounded": ["ao", "ow", "uh", "uw", "oy"],
    "diphthong": ["aw", "ay", "ey", "oy", "ow"],
}


def build_questions(phones, class_map, rich=False):
    """phones: iterable of names; class_map: {phone: (class, voiced)}.
    Returns the .hed lines.  ``rich`` adds class/voicing/vowel-feature
    questions at ALL five quinphone positions (full-scale sets on the
    reference's questions-en-radio_dnn_416 model)."""
    lines = []
    order = sorted(phones)
    phone_set = set(order)
    for pos, pattern in POSITION_PATTERNS.items():
        for phone in order:
            lines.append('QS "%s-%s" {%s}'
                         % (pos, phone, pattern.format(p=phone)))
    classes = {}
    for phone in order:
        cls, voiced = class_map.get(phone, ("other", False))
        classes.setdefault(cls, []).append(phone)
        if voiced:
            classes.setdefault("voiced", []).append(phone)
    if rich:
        for feat, members in VOWEL_FEATURES.items():
            members = [m for m in members if m in phone_set]
            if members:
                classes.setdefault(feat, []).extend(members)
    group_positions = POSITION_PATTERNS.items() if rich \
        else [("C", POSITION_PATTERNS["C"])]
    for pos, pattern in group_positions:
        for cls, members in sorted(classes.items()):
            pats = ",".join(pattern.format(p=m)
                            for m in sorted(set(members)))
            lines.append('QS "%s-%s" {%s}' % (pos, cls, pats))
    if rich:
        for key, pats in STRUCT_QS:
            lines.append('QS "%s" {%s}' % (key, ",".join(pats)))
    for key, pattern in (RICH_CQS_QUESTIONS if rich
                         else CQS_QUESTIONS):
        lines.append('CQS "%s" {%s}' % (key, pattern))
    return lines


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--phone_set", choices=["arpabet"], default=None)
    parser.add_argument("--phone_list", default=None,
                        help="file with one phone per line")
    parser.add_argument("--class_map", default=None,
                        help="TSV: phone<TAB>class[,voiced]")
    parser.add_argument("--out", required=True)
    parser.add_argument("--rich", action="store_true",
                        help="class/voicing/vowel-feature questions at "
                             "all five quinphone positions (full-scale "
                             "416-style set)")
    args = parser.parse_args()

    if args.phone_set == "arpabet":
        class_map = dict(ARPABET)
        phones = list(class_map)
    elif args.phone_list:
        with open(args.phone_list) as f:
            phones = [line.strip() for line in f if line.strip()]
        class_map = {}
        if args.class_map:
            with open(args.class_map) as f:
                for line in f:
                    if not line.strip():
                        continue
                    phone, spec = line.strip().split("\t", 1)
                    parts = spec.split(",")
                    class_map[phone] = (parts[0],
                                        "voiced" in parts[1:])
    else:
        parser.error("need --phone_set or --phone_list")

    lines = build_questions(phones, class_map, rich=args.rich)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote {} questions to {}".format(len(lines), args.out))


if __name__ == "__main__":
    main()
