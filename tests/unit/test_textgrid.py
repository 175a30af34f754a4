"""TextGrid reader + MFA label/duration loading tests against the
repo corpus MFA fixtures (labels/mfa/*.TextGrid)."""

import os

import numpy as np
import pytest

from idiaptts_tpu.data.phonemes import (PhonemeDurationLabelGen,
                                        PhonemeLabelGen)
from idiaptts_tpu.data.textgrid import read_textgrid

@pytest.fixture(scope="module")
def mfa_dir(fixtures_dir):
    return os.path.join(fixtures_dir, "labels", "mfa")


def test_parse_all_fixtures(mfa_dir, id_list):
    for id_name in id_list:
        tg = read_textgrid(os.path.join(mfa_dir,
                                        id_name + ".TextGrid"))
        assert [t.name for t in tg] == ["words", "phones"]
        phones = tg.get_tier("phones")
        assert len(phones) > 5
        # Contiguous intervals covering [0, xmax].
        assert phones[0].minTime == 0.0
        assert abs(phones[-1].maxTime - tg.maxTime) < 1e-6
        for a, b in zip(phones.entries[:-1], phones.entries[1:]):
            assert abs(a.maxTime - b.minTime) < 1e-9


def test_load_mfa_phonemes(mfa_dir, uid, fixtures_dir):
    symbols = PhonemeLabelGen._load_mfa(
        os.path.join(mfa_dir, uid + ".TextGrid"))
    # Non-silence symbols match the generating mono labels.
    with open(os.path.join(fixtures_dir, "labels", "mono_no_align",
                           uid + ".lab")) as f:
        mono = [l.strip() for l in f if l.strip()]
    mine = [s for s in symbols if s != PhonemeLabelGen.silent_symbol]
    ref = [s for s in mono if s not in ("sil", "pau")]
    assert mine == ref
    # Empty marks map to the silent symbol.
    assert PhonemeLabelGen.silent_symbol in symbols
    assert "" not in symbols


def test_mfa_durations_sum_to_utterance_length(mfa_dir, id_list):
    for id_name in id_list:
        path = os.path.join(mfa_dir, id_name + ".TextGrid")
        dur = PhonemeDurationLabelGen._get_mfa_dur(path, 0.005)
        tg = read_textgrid(path)
        assert dur.shape[1] == 1 and dur.dtype == np.float32
        np.testing.assert_allclose(dur.sum() * 0.005, tg.maxTime,
                                   rtol=1e-4)


def test_mfa_gen_data_and_load(mfa_dir, id_list, uid, tmp_path):
    label_dict, mean, std = PhonemeDurationLabelGen.gen_data(
        mfa_dir, dir_out=str(tmp_path), id_list=id_list[:3],
        label_type="mfa", return_dict=True)
    assert len(label_dict) == 3
    assert np.all(mean > 0)
    # load() picks up the TextGrid directly from the MFA directory too.
    direct = PhonemeDurationLabelGen.load_sample(
        uid, mfa_dir, label_type="mfa")
    np.testing.assert_allclose(direct, label_dict[uid])
    # Reloading the raw .dur written by gen_data keeps per-phone shape.
    reloaded = PhonemeDurationLabelGen.load_sample(
        uid, str(tmp_path), label_type="mfa")
    np.testing.assert_allclose(reloaded, label_dict[uid])


def test_quote_escapes_and_short_form(tmp_path):
    """Doubled-quote escapes and the short (unlabelled) format."""
    path = tmp_path / "short.TextGrid"
    path.write_text('\n'.join([
        '"ooTextFile"', '"TextGrid"', '0', '1.5', '<exists>', '1',
        '"IntervalTier"', '"phones"', '0', '1.5', '2',
        '0', '0.5', '"say ""hi"""',
        '0.5', '1.5', '"B"']))
    tg = read_textgrid(str(path))
    phones = tg.get_tier("phones")
    assert phones[0].mark == 'say "hi"'
    assert phones[1] == (0.5, 1.5, "B")
