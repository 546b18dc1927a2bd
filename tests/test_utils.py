"""Foundation utility tests (reference pattern:
``/root/reference/tests/test_utils.py``)."""
import pytest

from phd_qmclib_tpu import utils


def test_strict_update():
    base = {"a": 1, "b": 2}
    utils.strict_update(base, {"a": 10})
    assert base == {"a": 10, "b": 2}

    with pytest.raises(KeyError):
        utils.strict_update(dict(base), {"c": 3})

    with pytest.raises(KeyError):
        utils.strict_update(dict(base), {"a": 1}, full=True)

    utils.strict_update(base, {"a": 5, "b": 6}, full=True)
    assert base == {"a": 5, "b": 6}


def test_get_random_rng_seed():
    seeds = {utils.get_random_rng_seed() for _ in range(8)}
    assert len(seeds) > 1
    assert all(0 <= s <= utils.MAX_SEED for s in seeds)


def test_meshes():
    mesh = utils.items_to_mesh([1, 2], ["x", "y"])
    assert len(mesh) == 4 and (2, "y") in mesh

    dict_mesh = utils.mapping_to_mesh({"a": [1, 2], "b": [3]})
    assert dict_mesh == [{"a": 1, "b": 3}, {"a": 2, "b": 3}]
