"""jax backend must be bit-exact with the numpy oracle."""
import numpy as np
import pytest

import omm_tpu as omm

from fixtures import bake_stats, expect_stats, standard_circle


@pytest.fixture(scope="module")
def circle1024():
    return standard_circle(1024, 1024)


def test_jax_circle(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 4, backend="jax"),
                 total_opaque=204, total_transparent=219,
                 total_unknown_transparent=39, total_unknown_opaque=50)


def test_jax_matches_numpy_level6(circle1024):
    tc = np.array([[0.05, 0.1], [0.1, 0.9], [0.9, 0.9]], dtype=np.float32)
    a = bake_stats(circle1024, 0.5, 6, tex_coords=tc, indices=[0, 1, 2],
                   backend="numpy")
    b = bake_stats(circle1024, 0.5, 6, tex_coords=tc, indices=[0, 1, 2],
                   backend="jax")
    assert a == b


def test_jax_matches_numpy_wrap_mips():
    rng = np.random.RandomState(11)
    mips = [rng.rand(64, 64).astype(np.float32),
            rng.rand(32, 32).astype(np.float32)]
    tc = np.array([[-0.3, 0.2], [0.4, 1.7], [1.2, -0.1]], dtype=np.float32)
    kw = dict(tex_coords=tc, indices=[0, 1, 2], mips=mips,
              addressing_mode=omm.TextureAddressMode.Wrap)
    a = bake_stats(None, 0.5, 5, backend="numpy", **kw)
    b = bake_stats(None, 0.5, 5, backend="jax", **kw)
    assert a == b


def test_jax_matches_numpy_2state(circle1024):
    a = bake_stats(circle1024, 0.5, 4, fmt=omm.Format.OC1_2_State,
                   backend="numpy")
    b = bake_stats(circle1024, 0.5, 4, fmt=omm.Format.OC1_2_State,
                   backend="jax")
    assert a == b
