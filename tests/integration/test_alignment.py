"""Forced alignment on fixture audio: train monophone HMMs on 3
utterances, align, and compare phone boundaries against the corpus's
true generating alignment (loose agreement — tiny training set)."""

import os

import numpy as np
import pytest

from idiaptts_tpu.data.alignment import ForcedAligner, extract_mfcc
from idiaptts_tpu.data.phonemes import PhonemeLabelGen
from idiaptts_tpu.ops.audio_io import get_raw

def test_mfcc_shapes(fixtures_dir, uid):
    raw, fs = get_raw(os.path.join(fixtures_dir, "database", "wav",
                                   uid + ".wav"))
    mfcc = extract_mfcc(raw[:fs], fs)
    assert mfcc.shape[1] == 39
    assert np.all(np.isfinite(mfcc))


def test_forced_alignment(fixtures_dir, id_list, tmp_path):
    label_dir = os.path.join(fixtures_dir, "labels", "mono_no_align")
    ids = id_list[:3]
    utterances = {}
    phone_set = set()
    for id_name in ids:
        symbols = PhonemeLabelGen._load_mono(
            os.path.join(label_dir, id_name + ".lab"))
        utterances[id_name] = symbols
        phone_set.update(symbols)

    aligner = ForcedAligner(sorted(phone_set))
    aligner.train(os.path.join(fixtures_dir, "database", "wav"),
                  utterances, num_iterations=3)
    out_dir = aligner.align_corpus(str(tmp_path / "aligned"))

    for id_name in ids:
        path = os.path.join(out_dir, id_name + ".lab")
        assert os.path.isfile(path)
        with open(path) as f:
            lines = [l.split() for l in f if l.strip()]
        # Monotonic, contiguous state segments covering the utterance.
        assert int(lines[0][0]) == 0
        for prev, cur in zip(lines, lines[1:]):
            assert prev[1] == cur[0]
        # 5 states per phone in order.
        states = [int(l[2][-2]) for l in lines]
        assert states[0] == 2
        assert set(states) == {2, 3, 4, 5, 6}
        num_phones = sum(1 for s in states if s == 2)
        assert num_phones == len(utterances[id_name])

    # Boundary agreement with the reference HTK alignment: median
    # phone-boundary error under 150 ms (different acoustic models, 3
    # training utterances — sanity level).
    ref_dir = os.path.join(fixtures_dir, "labels", "label_state_align")
    id_name = ids[0]
    with open(os.path.join(ref_dir, id_name + ".lab")) as f:
        ref_lines = [l.split() for l in f if l.strip()]
    ref_bounds = [int(l[0]) / 1e7 for l in ref_lines
                  if l[2].endswith("[2]")]
    with open(os.path.join(out_dir, id_name + ".lab")) as f:
        my_lines = [l.split() for l in f if l.strip()]
    my_bounds = [int(l[0]) / 1e7 for l in my_lines
                 if l[2].endswith("[2]")]
    n = min(len(ref_bounds), len(my_bounds))
    err = np.abs(np.asarray(ref_bounds[:n]) - np.asarray(my_bounds[:n]))
    assert np.median(err) < 0.15, np.median(err)
