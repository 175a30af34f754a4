"""TextGrid reader + MFA label/duration loading tests against the
reference MFA fixtures (labels/mfa/*.TextGrid)."""

import os

import numpy as np
import pytest

from idiaptts_tpu.data.phonemes import (PhonemeDurationLabelGen,
                                        PhonemeLabelGen)
from idiaptts_tpu.data.textgrid import read_textgrid

IDS = ["LJ001-000{}".format(i) for i in range(1, 10)]


@pytest.fixture(scope="module")
def mfa_dir(fixtures_dir):
    return os.path.join(fixtures_dir, "labels", "mfa")


def test_parse_all_fixtures(mfa_dir):
    for id_name in IDS:
        tg = read_textgrid(os.path.join(mfa_dir,
                                        id_name + ".TextGrid"))
        assert [t.name for t in tg] == ["words", "phones"]
        phones = tg.get_tier("phones")
        assert len(phones) > 10
        # Contiguous intervals covering [0, xmax].
        assert phones[0].minTime == 0.0
        assert abs(phones[-1].maxTime - tg.maxTime) < 1e-6
        for a, b in zip(phones.entries[:-1], phones.entries[1:]):
            assert abs(a.maxTime - b.minTime) < 1e-9


def test_load_mfa_phonemes(mfa_dir):
    symbols = PhonemeLabelGen._load_mfa(
        os.path.join(mfa_dir, "LJ001-0001.TextGrid"))
    assert len(symbols) == 111
    assert symbols[:5] == ["P", "R", "IH1", "N", "T"]
    # Empty marks map to the silent symbol.
    assert PhonemeLabelGen.silent_symbol in symbols
    assert "" not in symbols


def test_mfa_durations_sum_to_utterance_length(mfa_dir):
    for id_name in IDS:
        path = os.path.join(mfa_dir, id_name + ".TextGrid")
        dur = PhonemeDurationLabelGen._get_mfa_dur(path, 0.005)
        tg = read_textgrid(path)
        assert dur.shape[1] == 1 and dur.dtype == np.float32
        np.testing.assert_allclose(dur.sum() * 0.005, tg.maxTime,
                                   rtol=1e-4)


def test_mfa_gen_data_and_load(mfa_dir, tmp_path):
    label_dict, mean, std = PhonemeDurationLabelGen.gen_data(
        mfa_dir, dir_out=str(tmp_path), id_list=IDS[:3],
        label_type="mfa", return_dict=True)
    assert len(label_dict) == 3
    assert np.all(mean > 0)
    # load() picks up the TextGrid directly from the MFA directory too.
    direct = PhonemeDurationLabelGen.load_sample(
        "LJ001-0001", mfa_dir, label_type="mfa")
    np.testing.assert_allclose(direct, label_dict["LJ001-0001"])
    # Reloading the raw .dur written by gen_data keeps per-phone shape.
    reloaded = PhonemeDurationLabelGen.load_sample(
        "LJ001-0001", str(tmp_path), label_type="mfa")
    np.testing.assert_allclose(reloaded, label_dict["LJ001-0001"])


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
