"""Randomized backend-parity net: numpy vs jax (and the batched pallas
engine in interpret mode) over the bake option space.  The hand-written
parity suites pin known-interesting cases; this sweeps random corners of
{address mode x filter x format x promotion x mips x UNORM8 x cutoff x
geometry (incl. out-of-range and degenerate triangles)} and requires
bit-identical arrays every time."""
import numpy as np
import pytest

import omm_tpu as omm


def _random_desc(rng):
    n = int(rng.choice([32, 64]))
    smooth = bool(rng.randint(2))
    plane = rng.rand(n, n).astype(np.float32) if smooth \
        else (rng.rand(n, n) > 0.5).astype(np.float32)
    unorm8 = bool(rng.randint(2))
    mips = [plane]
    if rng.randint(2):
        mips.append(plane[::2, ::2].copy())
    if unorm8:
        mips = [(m * np.float32(255)).astype(np.uint8) for m in mips]
    tex = omm.Texture(
        mips, omm.TextureFormat.UNORM8 if unorm8 else omm.TextureFormat.FP32)

    tri_count = int(rng.randint(1, 4))
    kind = rng.randint(3)
    if kind == 0:      # in-range
        tc = rng.rand(3 * tri_count, 2).astype(np.float32)
    elif kind == 1:    # out-of-range (wrap modes)
        tc = (rng.rand(3 * tri_count, 2) * 3.0 - 1.0).astype(np.float32)
    else:              # includes a degenerate (collinear) triangle
        tc = rng.rand(3 * tri_count, 2).astype(np.float32)
        a = rng.rand(2).astype(np.float32)
        d = rng.rand(2).astype(np.float32)
        tc[0], tc[1], tc[2] = a, a + d, a + 2 * d

    addr = omm.TextureAddressMode(rng.randint(5))
    filt = omm.TextureFilterMode(rng.randint(2))
    fmt = omm.Format.OC1_2_State if rng.randint(2) else \
        omm.Format.OC1_4_State
    promo = omm.UnknownStatePromotion(rng.randint(3))
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=tc,
        index_buffer=np.arange(3 * tri_count, dtype=np.uint32),
        index_count=3 * tri_count,
        runtime_sampler=omm.SamplerDesc(
            addressing_mode=addr, filter=filt,
            border_alpha=float(rng.rand()) if addr ==
            omm.TextureAddressMode.Border else 0.0),
        alpha_cutoff=float(rng.uniform(0.2, 0.8)),
        format=fmt, unknown_state_promotion=promo,
        max_subdivision_level=int(rng.randint(1, 5)),
        dynamic_subdivision_scale=0.0)
    return desc


@pytest.mark.parametrize("seed", range(4))
def test_backend_parity_fuzz(seed):
    rng = np.random.RandomState(1000 + seed)
    for trial in range(4):
        desc = _random_desc(rng)
        a = omm.bake(desc, backend="numpy")
        b = omm.bake(desc, backend="jax")
        ctx = (seed, trial, desc.runtime_sampler.addressing_mode,
               desc.runtime_sampler.filter, desc.format,
               desc.unknown_state_promotion)
        assert np.array_equal(a.array_data, b.array_data), ctx
        assert np.array_equal(a.index_buffer, b.index_buffer), ctx
        assert omm.get_stats(a) == omm.get_stats(b), ctx


@pytest.mark.slow
def test_pallas_engine_parity_fuzz(monkeypatch):
    import jax.experimental.pallas as plmod
    import omm_tpu.kernels.pallas_classify as pk

    orig = plmod.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pk.pl, "pallas_call", interp)

    rng = np.random.RandomState(77)
    for trial in range(4):
        desc = _random_desc(rng)
        a = omm.bake(desc, backend="numpy")
        c = omm.bake(desc, backend="pallas")
        assert np.array_equal(a.array_data, c.array_data), trial
        assert omm.get_stats(a) == omm.get_stats(c), trial
