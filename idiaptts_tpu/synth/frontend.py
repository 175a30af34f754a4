"""Built-in text front end: text -> HTS full-context labels with no
external tools.

Role: the reference drives Festival + perl scripts
(``scripts/tts_frontend/English/makeLabels.sh``, TTSModel.py:88-98) to
turn text into full-context labels; on a machine without Festival its
pipeline is unusable.  This module provides a self-contained
replacement: text normalisation, lexicon lookup (optional CMU-format
dictionary) with a rule-based English letter-to-sound fallback
(ARPABET), light syllabification, and label emission in the framework's
HTS-shaped label format — the format the committed question sets
(``idiaptts_tpu/assets/questions-en-arpabet_dnn.hed``,
``tools/make_question_file.py``) are generated for:

    ll~l-c+r=rr:pfw_pbw/A/{v|c}_{class}/B/{syl}-{wordlen}/J/{n}+{nv}-{widx}

``TTSModel.run_DM_AM`` falls back to this front end when no external
``front_end_cmd`` is configured, which makes the full text->speech path
runnable on a fresh machine.
"""

import os
import re

# ARPABET phone classes (shared convention with
# tools/make_question_file.py).
VOWELS = {"aa", "ae", "ah", "ao", "aw", "ax", "ay", "eh", "er", "ey",
          "ih", "iy", "ow", "oy", "uh", "uw"}
CLASSES = {
    "b": "plosive", "d": "plosive", "g": "plosive", "p": "plosive",
    "t": "plosive", "k": "plosive", "ch": "affricate",
    "jh": "affricate", "dh": "fricative", "f": "fricative",
    "s": "fricative", "sh": "fricative", "th": "fricative",
    "v": "fricative", "z": "fricative", "zh": "fricative",
    "hh": "fricative", "m": "nasal", "n": "nasal", "ng": "nasal",
    "l": "liquid", "r": "liquid", "w": "liquid", "y": "liquid",
    "sil": "silence", "pau": "silence", "sp": "silence",
}

# Ordered longest-match-first letter-to-sound rules (compact English
# grapheme->ARPABET; intelligible fallback, not a lexicon replacement).
_LTS_RULES = [
    ("tion", ["sh", "ah", "n"]), ("sion", ["zh", "ah", "n"]),
    ("ough", ["ow"]), ("augh", ["ao"]), ("eigh", ["ey"]),
    ("igh", ["ay"]), ("tch", ["ch"]), ("dge", ["jh"]),
    ("sch", ["s", "k"]), ("qu", ["k", "w"]), ("th", ["th"]),
    ("sh", ["sh"]), ("ch", ["ch"]), ("ph", ["f"]), ("wh", ["w"]),
    ("ck", ["k"]), ("ng", ["ng"]), ("gh", ["g"]), ("kn", ["n"]),
    ("wr", ["r"]), ("ee", ["iy"]), ("ea", ["iy"]), ("oo", ["uw"]),
    ("ou", ["aw"]), ("ow", ["ow"]), ("ai", ["ey"]), ("ay", ["ey"]),
    ("oi", ["oy"]), ("oy", ["oy"]), ("au", ["ao"]), ("aw", ["ao"]),
    ("oa", ["ow"]), ("ie", ["iy"]), ("ar", ["aa", "r"]),
    ("er", ["er"]), ("ir", ["er"]), ("ur", ["er"]),
    ("or", ["ao", "r"]),
    ("a", ["ae"]), ("b", ["b"]), ("c", ["k"]), ("d", ["d"]),
    ("e", ["eh"]), ("f", ["f"]), ("g", ["g"]), ("h", ["hh"]),
    ("i", ["ih"]), ("j", ["jh"]), ("k", ["k"]), ("l", ["l"]),
    ("m", ["m"]), ("n", ["n"]), ("o", ["aa"]), ("p", ["p"]),
    ("q", ["k"]), ("r", ["r"]), ("s", ["s"]), ("t", ["t"]),
    ("u", ["ah"]), ("v", ["v"]), ("w", ["w"]), ("x", ["k", "s"]),
    ("y", ["y"]), ("z", ["z"]),
]

_ONES = "zero one two three four five six seven eight nine".split()
_TEENS = ("ten eleven twelve thirteen fourteen fifteen sixteen "
          "seventeen eighteen nineteen").split()
_TENS = ("x x twenty thirty forty fifty sixty seventy eighty "
         "ninety").split()


def _number_to_words(num_str):
    n = int(num_str)
    if n < 10:
        return [_ONES[n]]
    if n < 20:
        return [_TEENS[n - 10]]
    if n < 100:
        words = [_TENS[n // 10]]
        if n % 10:
            words.append(_ONES[n % 10])
        return words
    if n < 1000:
        words = [_ONES[n // 100], "hundred"]
        if n % 100:
            words.extend(_number_to_words(str(n % 100)))
        return words
    if n < 1000000:
        words = _number_to_words(str(n // 1000)) + ["thousand"]
        if n % 1000:
            words.extend(_number_to_words(str(n % 1000)))
        return words
    return [_ONES[int(d)] for d in num_str]


def normalise_text(text):
    """Lowercase, expand numbers, map major punctuation to pause
    markers (the role of the reference's Text2FestivalReady perl
    normalisers)."""
    text = text.lower()
    text = re.sub(r"\d+", lambda m: " ".join(_number_to_words(
        m.group(0))), text)
    text = re.sub(r"[.!?;:]+", " <pau> ", text)
    text = re.sub(r"[^a-z' <>]+", " ", text)
    return [w for w in text.split() if w]


def letter_to_sound(word):
    """Rule-based English grapheme -> ARPABET conversion."""
    word = word.replace("'", "")
    # Silent final e.
    if len(word) > 3 and word.endswith("e") and word[-2] not in "aeiou":
        word = word[:-1]
    # Collapse doubled letters.
    word = re.sub(r"(.)\1", r"\1", word)
    phones = []
    i = 0
    while i < len(word):
        for pattern, out in _LTS_RULES:
            if word.startswith(pattern, i):
                phones.extend(out)
                i += len(pattern)
                break
        else:
            i += 1
    return phones


def load_lexicon(path):
    """CMU-dictionary-format lexicon: ``WORD  PH1 PH2 ...`` (stress
    digits are stripped; ``;;;`` comments skipped)."""
    lex = {}
    with open(path, encoding="utf-8", errors="ignore") as f:
        for line in f:
            if not line.strip() or line.startswith(";;;"):
                continue
            parts = line.split()
            word = re.sub(r"\(\d+\)$", "", parts[0]).lower()
            if word in lex:
                continue
            lex[word] = [re.sub(r"\d", "", p).lower()
                         for p in parts[1:]]
    return lex


class BuiltinFrontEnd:
    """Text -> phones -> full-context HTS labels."""

    def __init__(self, lexicon_path=None):
        self.lexicon = load_lexicon(lexicon_path) if lexicon_path \
            else {}

    def text_to_phones(self, text):
        """Returns [(phone, word_idx), ...] including boundary sil."""
        words = normalise_text(text)
        out = [("sil", -1)]
        widx = 0
        for word in words:
            if word == "<pau>":
                if out[-1][0] not in ("sil", "pau"):
                    out.append(("pau", -1))
                continue
            phones = self.lexicon.get(word) or letter_to_sound(word)
            for ph in phones:
                out.append((ph, widx))
            widx += 1
        out.append(("sil", -1))
        return out

    @staticmethod
    def _phone_class(phone):
        if phone in VOWELS:
            return "v", "vowel"
        return "c", CLASSES.get(phone, "other")

    def text_to_full_labels(self, text):
        """Full-context label lines (no timings), one per phone, in the
        framework label format (see module docstring)."""
        phones = self.text_to_phones(text)
        num = len(phones)
        nv = sum(1 for p, _ in phones if p in VOWELS)
        # word length (in phones) and per-word syllable indices
        word_lens = {}
        for p, w in phones:
            if w >= 0:
                word_lens[w] = word_lens.get(w, 0) + 1
        lines = []
        syl = 0
        prev_word = None
        for i, (c, w) in enumerate(phones):
            if w != prev_word:
                syl = 0
                prev_word = w
            if c in VOWELS:
                syl += 1
            def at(j):
                return phones[j][0] if 0 <= j < num else "xx"
            vc, cls = self._phone_class(c)
            lines.append(
                "{ll}~{l}-{c}+{r}={rr}:{pfw}_{pbw}"
                "/A/{vc}_{cls}"
                "/B/{syl}-{wlen}"
                "/J/{num}+{nv}-{widx}".format(
                    ll=at(i - 2), l=at(i - 1), c=c, r=at(i + 1),
                    rr=at(i + 2), pfw=i + 1, pbw=num - i, vc=vc,
                    cls=cls, syl=max(syl, 1), wlen=word_lens.get(w, 1),
                    num=num, nv=nv, widx=max(w, 0) + 1))
        return lines

    def write_labels(self, input_strings, out_dir):
        """Write ``utt%03d.lab`` phone-level full-context label files;
        returns the id list (TTSModel front-end contract)."""
        os.makedirs(out_dir, exist_ok=True)
        ids = []
        for i, text in enumerate(input_strings):
            uid = "utt{:03d}".format(i)
            with open(os.path.join(out_dir, uid + ".lab"), "w") as f:
                f.write("\n".join(self.text_to_full_labels(text)) + "\n")
            ids.append(uid)
        return ids
