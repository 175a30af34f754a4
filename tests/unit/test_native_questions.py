"""Native C++ question matcher: parity with the Python regex engine
(and hence with the reference fixture outputs) over every phone label
in the fixture corpus."""

import os

import numpy as np
import pytest

from idiaptts_tpu.data.questions import QuestionSet, _parse_state_label


@pytest.fixture(scope="module")
def question_set(question_file):
    return QuestionSet(question_file)


def test_native_builds(question_set):
    native = question_set.native()
    if native is None:
        pytest.skip("native toolchain unavailable")
    assert native.dict_size == question_set.dict_size


def test_native_parity_all_fixture_labels(fixtures_dir, id_list,
                                           question_set):
    native = question_set.native()
    if native is None:
        pytest.skip("native toolchain unavailable")
    labels = []
    for utt in id_list:
        phones = _parse_state_label(os.path.join(
            fixtures_dir, "labels", "label_state_align", utt + ".lab"))
        labels += [p[0] for p in phones]
    assert len(labels) > 50
    for label in labels:
        py = question_set.match(label)
        nat = native.match(label)
        np.testing.assert_allclose(nat, py, atol=1e-6,
                                   err_msg=label)


def test_native_match_many(question_set):
    native = question_set.native()
    if native is None:
        pytest.skip("native toolchain unavailable")
    labels = ["xx~xx-#+p=r:xx_xx/A/0_0_0/B/xx-xx-xx:xx-xx&xx-xx#xx-xx"
              "$xx-xx>xx-xx<xx-xx|xx/C/1+1+5/D/0_0/E/xx+xx:xx+xx&xx+xx"
              "#xx+xx/F/content_2/G/0_0/H/xx=xx:1=5&0/I/2_1/J/38+27-5"]
    batch = native.match_many(labels * 3)
    assert batch.shape == (3, question_set.dict_size)
    np.testing.assert_allclose(batch[0], question_set.match(labels[0]),
                               atol=1e-6)

def test_native_parity_fuzzed_labels(question_set):
    """Randomised HTS-style labels (mutated phones, numbers, and junk
    fields) must produce identical answers from both engines."""
    import random
    native = question_set.native()
    if native is None:
        pytest.skip("native toolchain unavailable")
    rng = random.Random(7)
    phones = ["p", "r", "ih", "n", "t", "sil", "pau", "ax", "jh", "zh",
              "xx", "oy", "eh", "w"]

    def rand_label():
        def ph():
            return rng.choice(phones)
        def num(lo=0, hi=40):
            return str(rng.randint(lo, hi))
        return ("{}^{}-{}+{}={}@{}_{}"
                "/A:{}_{}_{}/B:{}-{}-{}@{}-{}&{}-{}#{}-{}${}-{}!{}-{}"
                ";{}-{}|{}/C:{}+{}+{}/D:{}_{}/E:{}+{}@{}+{}&{}+{}#{}+{}"
                "/F:{}_{}/G:{}_{}/H:{}={}@{}={}|{}/I:{}={}/J:{}+{}-{}"
                ).format(
            ph(), ph(), ph(), ph(), ph(), num(1, 9), num(1, 9),
            num(), num(), num(),
            num(), num(), num(), num(), num(), num(), num(), num(),
            num(), num(), num(), num(), num(), num(), num(), ph(),
            num(), num(), num(),
            rng.choice(["content", "aux", "det", "0"]), num(),
            num(), num(), num(), num(), num(), num(), num(), num(),
            rng.choice(["content", "0"]), num(),
            num(), num(),
            num(), num(), num(), num(), ph(),
            num(), num(),
            num(), num(), num())

    for _ in range(300):
        label = "0 1 " + rand_label() + "[2]"
        py = question_set.match(label)
        nat = native.match(label)
        np.testing.assert_allclose(nat, py, atol=1e-6, err_msg=label)
