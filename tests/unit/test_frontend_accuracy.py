"""Phone accuracy of the builtin front end, scored against the
reference's MFA-aligned ARPABET ground truth on the fixture corpus.

Role: the reference's front end is Festival + a lexicon
(``scripts/tts_frontend/English/makeLabels.sh``); its fixture corpus
ships MFA alignments (``test/integration/fixtures/labels/mfa/*.TextGrid``,
phones tier = stressed ARPABET) for the nine LJ utterances whose texts
are in ``fixtures/database/utts.data``.  This test runs the builtin
front end (bundled ``assets/lexicon-en-us.dict``) on those exact texts
and pins phone-level agreement (Levenshtein alignment, stress digits
stripped, silences excluded).

Measured at recording time: 0.954 overall with the bundled lexicon
(vs 0.661 with pure rule LTS); worst single utterance 0.932.  Residual
disagreements are MFA variant choices (e.g. reduced-vowel AH0 vs IH0),
not wrong words.
"""

import os
import re

import numpy as np
import pytest

from idiaptts_tpu.data.textgrid import read_textgrid
from idiaptts_tpu.synth.frontend import BuiltinFrontEnd, DEFAULT_LEXICON

REF_FIXTURES = "/root/reference/test/integration/fixtures"
UTTS = os.path.join(REF_FIXTURES, "database", "utts.data")
MFA_DIR = os.path.join(REF_FIXTURES, "labels", "mfa")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(UTTS), reason="reference fixtures unavailable")

_SIL_MARKS = {"", "sil", "sp", "spn"}


def _edit_distance(a, b):
    n, m = len(a), len(b)
    dist = np.zeros((n + 1, m + 1), dtype=np.int64)
    dist[:, 0] = np.arange(n + 1)
    dist[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dist[i, j] = min(dist[i - 1, j] + 1, dist[i, j - 1] + 1,
                             dist[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(dist[n, m])


def _mfa_phones(uid):
    tg = read_textgrid(os.path.join(MFA_DIR, uid + ".TextGrid"))
    return [re.sub(r"\d", "", iv.mark).lower()
            for iv in tg.get_tier("phones")
            if iv.mark.lower() not in _SIL_MARKS]


def _utterances():
    with open(UTTS) as f:
        for line in f:
            uid, text = line.split(" ", 1)
            yield uid, text.strip()


def _accuracy(front_end):
    per_utt = {}
    total_err = total_ref = 0
    for uid, text in _utterances():
        ref = _mfa_phones(uid)
        hyp = [p for p, _ in front_end.text_to_phones(text)
               if p not in ("sil", "pau")]
        err = _edit_distance(ref, hyp)
        per_utt[uid] = 1.0 - err / len(ref)
        total_err += err
        total_ref += len(ref)
    return 1.0 - total_err / total_ref, per_utt


def test_bundled_lexicon_ships_and_loads():
    fe = BuiltinFrontEnd()
    assert os.path.isfile(DEFAULT_LEXICON)
    assert len(fe.lexicon) >= 1000
    # Stress digits are retained for the CQS stress contexts.
    assert any(s in (1, 2) for ph, s in fe.lexicon["printing"])


def test_phone_accuracy_vs_mfa_ground_truth():
    overall, per_utt = _accuracy(BuiltinFrontEnd())
    assert overall >= 0.93, per_utt
    assert min(per_utt.values()) >= 0.90, per_utt


def test_lexicon_beats_pure_lts():
    """The bundled lexicon is the accuracy driver: rule LTS alone sits
    near 0.66 on the same corpus."""
    with_lex, _ = _accuracy(BuiltinFrontEnd())
    lts_only, _ = _accuracy(BuiltinFrontEnd(lexicon_path=""))
    assert with_lex >= lts_only + 0.15
