"""Validate the bundled lexicon: phone inventory, stress digits,
duplicates, and character set.  Run after editing
assets/lexicon-en-us.dict; exits nonzero on any hard error.

Role: the reference inherits lexicon hygiene from Festival's compiled
lexicons; the builtin front end's dictionary is plain text and needs an
explicit gate (also run by tests/unit/test_lexicon_integrity.py).
"""

import re
import sys

VOWELS = {"AA", "AE", "AH", "AO", "AW", "AX", "AY", "EH", "ER", "EY",
          "IH", "IY", "OW", "OY", "UH", "UW"}
CONSONANTS = {"B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L",
              "M", "N", "NG", "P", "R", "S", "SH", "T", "TH", "V",
              "W", "Y", "Z", "ZH"}


def validate(path):
    errors, warnings = [], []
    seen = {}
    n_entries = 0
    with open(path, encoding="utf-8") as f:
        for lineno, line in enumerate(f, 1):
            if not line.strip() or line.startswith(";;;"):
                continue
            if not re.fullmatch(r"[A-Z'().\-0-9 ]+\n?", line):
                errors.append("%d: non-ASCII or bad chars: %r"
                              % (lineno, line.strip()))
                continue
            parts = line.split()
            word, phones = parts[0], parts[1:]
            n_entries += 1
            base = re.sub(r"\(\d+\)$", "", word)
            if base in seen and not word.endswith(")"):
                warnings.append("%d: duplicate %s (first at %d)"
                                % (lineno, word, seen[base]))
            seen.setdefault(base, lineno)
            if not phones:
                errors.append("%d: %s has no phones" % (lineno, word))
                continue
            n_primary = 0
            for p in phones:
                m = re.fullmatch(r"([A-Z]+)([0-2])?", p)
                if not m:
                    errors.append("%d: %s bad phone %r"
                                  % (lineno, word, p))
                    continue
                ph, digit = m.group(1), m.group(2)
                if ph in VOWELS:
                    if digit is None:
                        errors.append("%d: %s vowel %s missing stress"
                                      % (lineno, word, p))
                    elif digit == "1":
                        n_primary += 1
                elif ph in CONSONANTS:
                    if digit is not None:
                        errors.append("%d: %s consonant %s has digit"
                                      % (lineno, word, p))
                else:
                    errors.append("%d: %s unknown phone %r"
                                  % (lineno, word, p))
            if n_primary == 0 and any(
                    re.sub(r"\d", "", p) in VOWELS for p in phones):
                warnings.append("%d: %s has no primary stress"
                                % (lineno, word))
            if n_primary > 1:
                warnings.append("%d: %s has %d primary stresses"
                                % (lineno, word, n_primary))
    return n_entries, errors, warnings


def main(path):
    n, errors, warnings = validate(path)
    for w in warnings:
        print("WARN", w)
    for e in errors:
        print("ERROR", e)
    print("%d entries, %d errors, %d warnings" % (n, len(errors),
                                                  len(warnings)))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  "idiaptts_tpu/assets/lexicon-en-us.dict"))
