"""Merge a batch of new entries into the bundled lexicon.

Reads candidate entries (``WORD  PH ON ES`` lines, ``;``/blank lines
ignored) from the file given as argv[1], drops any whose base word is
already present in the lexicon OR already reachable through the front
end's morphological fallback (those would be dead weight), validates
the survivors with tools/validate_lexicon.py's rules, merges them in
sorted order, and atomically rewrites the dictionary.

Usage:  python tools/merge_lexicon_batch.py /tmp/batch.txt [--keep-derivable]

``--keep-derivable`` skips the morphology filter (useful for words the
morphology *can* derive but mispronounces, e.g. irregular forms).
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LEX = os.path.join(REPO, "idiaptts_tpu", "assets", "lexicon-en-us.dict")

from tools.validate_lexicon import VOWELS, CONSONANTS  # noqa: E402


def check_entry(word, phones):
    if not re.fullmatch(r"[A-Z'().\-0-9]+", word):
        return "bad word chars"
    if not phones:
        return "no phones"
    n_primary = 0
    has_vowel = False
    for p in phones:
        m = re.fullmatch(r"([A-Z]+)([0-2])?", p)
        if not m:
            return "bad phone %r" % p
        ph, digit = m.group(1), m.group(2)
        if ph in VOWELS:
            has_vowel = True
            if digit is None:
                return "vowel %s missing stress" % p
            if digit == "1":
                n_primary += 1
        elif ph in CONSONANTS:
            if digit is not None:
                return "consonant %s has digit" % p
        else:
            return "unknown phone %r" % p
    if has_vowel and n_primary != 1:
        return "%d primary stresses" % n_primary
    return None


def main(batch_path, keep_derivable=False):
    from idiaptts_tpu.synth.frontend import BuiltinFrontEnd, \
        morphological_lookup
    fe = BuiltinFrontEnd()

    existing = {}   # word -> line
    header = []
    with open(LEX, encoding="utf-8") as f:
        for line in f:
            if line.startswith(";;;"):
                header.append(line)
            elif line.strip():
                existing[line.split()[0]] = line.rstrip("\n")

    new, skipped, bad = [], [], []
    with open(batch_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(";"):
                continue
            parts = line.split()
            word, phones = parts[0].upper(), parts[1:]
            err = check_entry(word, phones)
            if err:
                bad.append("%s: %s" % (word, err))
                continue
            base = re.sub(r"\(\d+\)$", "", word)
            if base in existing:
                skipped.append(word + " (present)")
                continue
            lw = base.lower()
            if (not keep_derivable and lw not in fe.lexicon
                    and morphological_lookup(lw, fe.lexicon)):
                skipped.append(word + " (derivable)")
                continue
            existing[word] = "%s  %s" % (word, " ".join(phones))
            new.append(word)

    if bad:
        print("REJECTED batch, %d bad entries:" % len(bad))
        for b in bad:
            print("  ", b)
        return 1

    tmp = LEX + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.writelines(header)
        for w in sorted(existing):
            f.write(existing[w] + "\n")
    os.replace(tmp, LEX)
    print("merged %d new entries (%d skipped: %s...); total %d"
          % (len(new), len(skipped), ", ".join(skipped[:8]),
             len(existing)))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], "--keep-derivable" in sys.argv[2:]))
