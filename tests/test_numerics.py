"""Device-numerics determinism units (kernels/levelline.exact_sqrt and
guard): the smooth-alpha scene tests catch end-to-end divergence; these
pin the primitives directly."""
import numpy as np


def test_exact_sqrt_matches_ieee_on_device():
    import jax
    import jax.numpy as jnp
    from omm_tpu.kernels.levelline import exact_sqrt

    rng = np.random.RandomState(0)
    parts = [
        (rng.rand(200000).astype(np.float32) + 1e-7) * np.float32(s)
        for s in (1e-9, 1e-3, 1.0, 1e3, 1e9)
    ]
    xs = np.concatenate(parts + [np.array(
        [0.0, 1.0, 2.0, 4.0, 0.25, 131548264.0, np.inf], np.float32)])
    got = np.asarray(jax.jit(lambda v: exact_sqrt(jnp, v))(jnp.asarray(xs)))
    want = np.sqrt(xs)
    assert np.array_equal(got, want)
    # numpy passthrough
    assert np.array_equal(exact_sqrt(np, xs), want)


def test_guard_blocks_fma_contraction():
    """The canonical contraction repro: a*w + b*u + c*v must round each
    product separately (the unfenced jit result differs on this input on
    contracting backends; the fence restores the oracle value)."""
    import jax
    import jax.numpy as jnp
    from omm_tpu.kernels.levelline import guard

    p0 = np.float32(0.27539893984794617)
    p1 = np.float32(0.27539893984794617)
    p2 = np.float32(0.5626703500747681)
    u = v = np.float32(0.03125)
    F = np.float32
    w = F(F(1.0) - u - v)
    ref = F(F(F(p0 * w) + F(p1 * u)) + F(p2 * v))

    def fenced(a, b, c, d, e, fz):
        W = jnp.float32(1.0) - d - e
        return (guard(jnp, a * W, fz) + guard(jnp, b * d, fz)
                + guard(jnp, c * e, fz))

    N = 512
    args = [jnp.full((N,), x) for x in (p0, p1, p2, u, v)]
    out = np.asarray(jax.jit(fenced)(*args, jnp.int32(0)))
    assert (out == ref).all()


def test_guard_is_identity():
    import jax
    import jax.numpy as jnp
    from omm_tpu.kernels.levelline import guard

    x = np.array([0.0, -1.5, 3.25, 1e-30, 1e30], np.float32)
    fz = jnp.int32(0)
    y = np.asarray(jax.jit(lambda v, z: guard(jnp, v, z))(jnp.asarray(x), fz))
    assert np.array_equal(x, y)
    assert guard(np, x) is x


def test_winding_stable_bound_brute_force():
    """geom.winding_stable must never pass a triangle that has ANY
    micro-triangle whose fp32 per-micro winding (the oracle's op order)
    disagrees with the macro winding — swept over random thin slivers."""
    import numpy as np

    import omm_tpu as omm
    from omm_tpu import bird, geom

    rng = np.random.RandomState(123)
    checked = 0
    for trial in range(600):
        a = rng.rand(2).astype(np.float32) * 2 - 0.5
        d = (rng.rand(2).astype(np.float32) - 0.5) * 1.5
        eps = np.float32(10.0 ** rng.uniform(-8, -2))
        perp = np.array([-d[1], d[0]], np.float32)
        tri = np.stack([a, a + d,
                        a + d * np.float32(rng.rand())
                        + perp * eps]).astype(np.float32)
        if bool(geom.is_degenerate(tri)):
            continue
        for subdiv in (4, 6):
            M = omm.get_num_micro_triangles(subdiv)
            muvs = bird.micro_triangle_uvs(
                tri, np.arange(M, dtype=np.uint32), subdiv)
            flips = (geom.is_ccw(muvs) != bool(geom.is_ccw(tri))).any()
            if bool(geom.winding_stable(tri, subdiv)):
                assert not flips, (tri, subdiv)
            checked += 1
    assert checked > 400


def test_thin_sliver_device_paths_match_oracle():
    """fp32-thin (winding-unstable) slivers: every device entry must
    route around the macro-winding shortcut and match the oracle."""
    import numpy as np

    import omm_tpu as omm
    from omm_tpu import engine, geom, bird
    from omm_tpu.kernels.jax_classify import (classify_work_item_jax,
                                              classify_linear_survivors)
    from omm_tpu.kernels.mxu_classify import classify_work_item_mxu
    from omm_tpu.kernels import twophase as tp

    rng = np.random.RandomState(99)
    plane = (rng.rand(64, 64) > 0.5).astype(np.float32)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    cfg = engine.ResampleConfig(
        addr_mode=omm.TextureAddressMode.Clamp,
        filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
        border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)

    # find slivers with actual per-µtri winding flips
    slivers = []
    for trial in range(500):
        a = rng.rand(2).astype(np.float32) * 0.6 + 0.1
        d = (rng.rand(2).astype(np.float32) - 0.5)
        eps = np.float32(10.0 ** rng.uniform(-7, -4.5))
        perp = np.array([-d[1], d[0]], np.float32)
        tri = np.stack([a, a + d,
                        a + d * np.float32(rng.rand())
                        + perp * eps]).astype(np.float32)
        if bool(geom.is_degenerate(tri)):
            continue
        muvs = bird.micro_triangle_uvs(
            tri, np.arange(M, dtype=np.uint32), subdiv)
        if (geom.is_ccw(muvs) != bool(geom.is_ccw(tri))).any():
            assert not bool(geom.winding_stable(tri, subdiv))
            slivers.append(tri)
            if len(slivers) >= 3:
                break
    assert len(slivers) >= 1

    for tri in slivers:
        fresh = np.full(M, 3, np.uint8)
        want = engine.resample_fine_item(tex, cfg, tri, subdiv,
                                         fresh.copy())
        # macro-winding engines refuse the item
        assert classify_work_item_mxu(tex, cfg, tri, subdiv,
                                      fresh.copy()) is None
        # routed entries match the oracle exactly
        got_jax = classify_work_item_jax(tex, cfg, tri, subdiv,
                                         fresh.copy())
        assert (got_jax == want).all()
        got_sur = classify_linear_survivors(tex, cfg, tri, subdiv,
                                            fresh.copy())
        assert (got_sur == want).all()
        got_tp = tp.classify_work_items_batch(
            tex, cfg, [(tri, fresh.copy())], subdiv)[0]
        assert (got_tp == want).all()
