import pytest

from idiaptts_tpu.hparams import ExtendedHParams


def test_add_and_get():
    hp = ExtendedHParams()
    hp.add_hparam("lr", 0.1)
    assert hp.lr == 0.1
    hp.lr = 0.2
    assert hp.lr == 0.2


def test_duplicate_add_raises():
    hp = ExtendedHParams(lr=0.1)
    with pytest.raises(ValueError):
        hp.add_hparam("lr", 0.3)


def test_unknown_set_raises():
    hp = ExtendedHParams()
    with pytest.raises(ValueError):
        hp.unknown = 5


def test_type_check():
    hp = ExtendedHParams(batch=4)
    with pytest.raises(ValueError):
        hp.batch = "eight"
    hp2 = ExtendedHParams(rate=0.5)
    hp2.rate = 1  # int ok where float declared
    assert hp2.rate == 1.0


def test_parse():
    hp = ExtendedHParams(lr=0.1, layers=[1, 2], name="x", flag=False)
    hp.parse("lr=0.5,layers=[3,4,5],name=model,flag=True")
    assert hp.lr == 0.5
    assert hp.layers == [3, 4, 5]
    assert hp.name == "model"
    assert hp.flag is True


def test_parse_unknown_raises():
    hp = ExtendedHParams(lr=0.1)
    with pytest.raises(ValueError):
        hp.parse("nope=3")


def test_override_from_hparam():
    a = ExtendedHParams(lr=0.1, epochs=2)
    b = ExtendedHParams(lr=0.9, extra="yes")
    a.override_from_hparam(b)
    assert a.lr == 0.9 and a.epochs == 2 and a.extra == "yes"


def test_create_hparams_defaults_and_verify():
    hp = ExtendedHParams.create_hparams()
    assert hp.batch_size_train == 1
    assert hp.compute_dtype == "bfloat16"
    assert hp.verify()
    hp2 = ExtendedHParams.create_hparams("epochs=5,learning_rate=0.01")
    assert hp2.epochs == 5 and hp2.learning_rate == 0.01


def test_del_and_contains():
    hp = ExtendedHParams(a=1)
    assert "a" in hp
    hp.del_hparam("a")
    assert "a" not in hp


def test_copy_independent():
    hp = ExtendedHParams(xs=[1, 2])
    cp = hp.copy()
    cp.xs.append(3)
    assert hp.xs == [1, 2]


def test_reference_surface_aliases():
    """set_hparam / get_value / enable_backwards_compatibility
    (ExtendedHParams.py:29-131 roles)."""
    import pytest
    from idiaptts_tpu.hparams import ExtendedHParams
    hp = ExtendedHParams.create_hparams()
    hp.set_hparam("learning_rate", 0.01)
    assert hp.learning_rate == 0.01
    with pytest.raises(ValueError):
        hp.set_hparam("no_such_key", 1)
    assert hp.get_value("learning_rate", None) == 0.01
    assert hp.get_value("missing_attribute", "fallback") == "fallback"
    hp.add_hparams(checkpoint_epoch=7)
    hp.load_from_checkpoint = True
    hp.enable_backwards_compatibility()
    assert hp.get("epoch_to_load") == 7
    assert not hp.has_value("checkpoint_epoch")
    if isinstance(hp.get("optimiser_args"), dict):
        assert hp.optimiser_args.get("lr") == 0.01
