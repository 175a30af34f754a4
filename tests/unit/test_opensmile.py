"""OpenSMILELabelGen tests with a stubbed ``SMILExtract`` binary
(reference OpenSMILELabelGen.py:29-146): the subprocess call, CSV
parsing, npz layout, stats accumulation, and reader round trip — without
openSMILE installed."""

import os
import stat

import numpy as np
import pytest

from idiaptts_tpu.data.opensmile import OpenSMILELabelGen

FAKE_SMILE = r"""#!/usr/bin/env python
import sys

args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
wav, out = args["-I"], args["-csvoutput"]
# Deterministic per-file features: 4 frames x 3 dims derived from the
# wav filename so different utterances differ.
seed = sum(ord(c) for c in wav.rsplit("/", 1)[-1])
with open(out, "w") as f:
    for t in range(4):
        row = [seed % 10 + t, t * 0.5, float(seed % 3)]
        f.write(";".join(str(v) for v in row) + "\n")
"""


@pytest.fixture
def fake_smile(tmp_path, monkeypatch):
    binary = tmp_path / "SMILExtract"
    binary.write_text(FAKE_SMILE)
    binary.chmod(binary.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH",
                       str(tmp_path) + os.pathsep + os.environ["PATH"])
    config = tmp_path / "egemaps.conf"
    config.write_text("; fake config\n")
    return str(binary), str(config)


def test_missing_binary_raises(tmp_path):
    with pytest.raises(RuntimeError, match="not found on PATH"):
        OpenSMILELabelGen.extract_features(
            str(tmp_path / "a.wav"), "conf",
            smile_binary="definitely-not-a-binary")


def test_extract_features_parses_csv(fake_smile, tmp_path):
    binary, config = fake_smile
    wav = tmp_path / "utt1.wav"
    wav.write_bytes(b"RIFF")
    feats = OpenSMILELabelGen.extract_features(str(wav), config)
    assert feats.shape == (4, 3)
    assert feats.dtype == np.float32
    # Deterministic: same file, same features.
    np.testing.assert_array_equal(
        feats, OpenSMILELabelGen.extract_features(str(wav), config))


def test_gen_data_and_reader_roundtrip(fake_smile, tmp_path):
    binary, config = fake_smile
    dir_wav = tmp_path / "wav"
    dir_out = tmp_path / "smile"
    dir_wav.mkdir()
    dir_out.mkdir()
    ids = ["utt1", "utt2"]
    for id_name in ids:
        (dir_wav / (id_name + ".wav")).write_bytes(b"RIFF")

    gen_config = OpenSMILELabelGen.Config(
        name="egemaps", directory=str(dir_out), config_file=config)
    gen = OpenSMILELabelGen(gen_config)
    label_dict, (mean, std) = gen.gen_data(
        str(dir_wav), dir_out=str(dir_out), id_list=ids,
        return_dict=True)
    assert set(label_dict) == set(ids)
    assert mean.shape[-1] == 3
    # Different utterances produce different features.
    assert not np.allclose(label_dict["utt1"], label_dict["utt2"])

    # npz written per utterance; reader loads + normalises them.
    reader = gen_config.create_reader()
    sample = reader["utt1"]["egemaps"]
    assert sample.shape == (4, 3)
    raw = label_dict["utt1"]
    denorm = reader.postprocess_sample(sample)
    np.testing.assert_allclose(denorm, raw, atol=1e-4)
