"""Hierarchical two-phase engine parity (kernels/twophase.py).

The exact Pallas stage runs in interpret mode on CPU; the real-chip run
is gated by bench.py's bit-exactness check.  Oracle = per-item
resample_fine_item (itself validated against the reference suite's
hard-coded stats in test_bake_oracles.py).
"""
import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import engine

from fixtures import standard_circle, sine_fp32, sine_unorm8


def _interp_pallas(monkeypatch):
    import jax.experimental.pallas as plmod
    import omm_tpu.kernels.pallas_classify as pk

    orig = plmod.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pk.pl, "pallas_call", interp)


def _cfg(**over):
    base = dict(addr_mode=omm.TextureAddressMode.Clamp,
                filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
                border_alpha=0.0, fmt=omm.Format.OC1_4_State,
                promotion=omm.UnknownStatePromotion.Nearest,
                cutoff_gt=omm.OpacityState.Opaque,
                cutoff_le=omm.OpacityState.Transparent)
    base.update(over)
    return engine.ResampleConfig(**base)


def _tris(n, seed=7):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        b = rng.rand(2).astype(np.float32) * 0.25
        out.append(np.array([b + [0.05, 0.08], b + [0.12, 0.7],
                             b + [0.72, 0.6]], np.float32))
    return out


def _check_batch(tex, cfg, tris, subdiv, monkeypatch):
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    M = omm.get_num_micro_triangles(subdiv)
    items = [(t, np.full(M, 3, np.uint8)) for t in tris]
    got = tp.classify_work_items_batch(tex, cfg, items, subdiv)
    for t, st in zip(tris, got):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st == want).all(), (
            f"two-phase mismatch: {(st != want).sum()} of {M}")


@pytest.mark.slow
def test_twophase_circle_batch(monkeypatch):
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    _check_batch(tex, _cfg(), _tris(3), 5, monkeypatch)


@pytest.mark.slow
def test_twophase_wrap_and_2state(monkeypatch):
    tex = omm.Texture([sine_fp32(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg(addr_mode=omm.TextureAddressMode.Wrap,
               fmt=omm.Format.OC1_2_State)
    tris = [np.array([[0.1, -0.2], [0.2, 1.1], [1.3, 0.7]], np.float32)]
    _check_batch(tex, cfg, tris, 5, monkeypatch)


@pytest.mark.slow
def test_twophase_unorm8_mips_force_opaque(monkeypatch):
    m0 = sine_unorm8(64, 64)
    m1 = m0[::2, ::2].copy()
    tex = omm.Texture([m0, m1], omm.TextureFormat.UNORM8)
    cfg = _cfg(promotion=omm.UnknownStatePromotion.ForceOpaque)
    _check_batch(tex, cfg, _tris(2, seed=3), 4, monkeypatch)


@pytest.mark.slow
def test_twophase_near_cutoff_margin(monkeypatch):
    """Values within the fp-safety margin of the cutoff must go through
    the exact kernel, never the window shortcut."""
    rng = np.random.RandomState(0)
    plane = (np.float32(0.5)
             + (rng.rand(64, 64).astype(np.float32) - np.float32(0.5))
             * np.float32(1e-6))
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    _check_batch(tex, _cfg(), _tris(1), 4, monkeypatch)


@pytest.mark.slow
def test_twophase_respects_active_mask(monkeypatch):
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tri = _tris(1)[0]
    pre = np.full(M, 3, np.uint8)
    pre[: M // 2] = 0  # pre-resolved by the coarse pass: must be kept
    got = tp.classify_work_items_batch(tex, cfg, [(tri, pre.copy())],
                                       subdiv)[0]
    assert (got[: M // 2] == 0).all()
    want = engine.resample_fine_item(tex, cfg, tri, subdiv, pre.copy())
    assert (got == want).all()


@pytest.mark.slow
def test_twophase_degenerate_falls_back(monkeypatch):
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 4
    M = omm.get_num_micro_triangles(subdiv)
    degen = np.array([[0.1, 0.1], [0.4, 0.4], [0.7, 0.7]], np.float32)
    tri = _tris(1)[0]
    items = [(degen, np.full(M, 3, np.uint8)),
             (tri, np.full(M, 3, np.uint8))]
    got = tp.classify_work_items_batch(tex, cfg, items, subdiv)
    for (t, _), st in zip(items, got):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st == want).all()


@pytest.mark.slow
def test_bake_pallas_backend_matches_numpy(monkeypatch):
    """Full bake() through the batched engine == numpy-backend bake."""
    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    uvs = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32)
    idxb = np.array([0, 1, 2, 3, 1, 2], np.uint32)
    desc = omm.BakeInputDesc(texture=tex, tex_coords=uvs,
                             index_buffer=idxb, index_count=6,
                             max_subdivision_level=5)
    a = omm.bake(desc, backend="numpy")
    b = omm.bake(desc, backend="pallas")
    assert np.array_equal(a.array_data, b.array_data)
    assert np.array_equal(a.index_buffer, b.index_buffer)
    assert omm.get_stats(a) == omm.get_stats(b)


def test_classify_post_out_digests(monkeypatch):
    """post_out must deliver (states3 digest, uniform value) pairs that
    match a from-scratch recompute on the returned states — bake's
    exact-dedup and promotion trust these without re-scanning."""
    from omm_tpu import native
    from omm_tpu.kernels import twophase as tp
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(128, 128)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 6
    tris = _tris(6)
    batches = [[(t, None) for t in tris[:3]],
               [(t, None) for t in tris[3:]]]
    # first call discovers capacities on the sync path (no post); the
    # speculative single-sync chain — the steady state — fills post
    tp.classify_work_items_batches(tex, cfg, batches, subdiv)
    posts = []
    outs = tp.classify_work_items_batches(tex, cfg, batches, subdiv,
                                          post_out=posts)
    assert len(posts) == 2
    n_cached = 0
    for batch_out, pd in zip(outs, posts):
        for i, st in enumerate(batch_out):
            if i in pd:
                dig, uni = pd[i]
                assert dig == native.states3_digest(st), i
                assert uni == native.all_uniform_u8(st), i
                n_cached += 1
    assert n_cached > 0  # the fast path must have produced post entries


@pytest.mark.slow
def test_twophase_speculative_overflow_recovers(monkeypatch):
    """Seed the capacity cache with absurdly small buckets: the
    single-sync speculative pass must flag overflow and the batch must be
    recomputed exactly by the discovery path."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tris = _tris(2)
    items = [(t, np.full(M, 3, np.uint8)) for t in tris]

    lg = tp._group_level(tex, tris, subdiv)
    levels = tp._descend_levels(tex, tris, subdiv, lg)
    tex._omm_caps = {(subdiv, levels, 2, True):
                     (tuple(1024 for _ in levels[1:]), 512, (8,))}
    got = tp.classify_work_items_batch(tex, cfg, items, subdiv)
    for t, st in zip(tris, got):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st == want).all()


@pytest.mark.slow
def test_twophase_pipelined_batches(monkeypatch):
    """classify_work_items_batches: several batches, speculative steady
    state after the first, all bit-exact."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tris = _tris(6, seed=11)

    def batches():
        return [[(t, np.full(M, 3, np.uint8)) for t in tris[k:k + 2]]
                for k in range(0, 6, 2)]

    tp.classify_work_items_batches(tex, cfg, batches(), subdiv)  # discover
    outs = tp.classify_work_items_batches(tex, cfg, batches(), subdiv)
    flat = [st for b in outs for st in b]
    for t, st in zip(tris, flat):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st == want).all()


def test_twophase_none_states_fresh_items(monkeypatch):
    """states=None (declared fresh item: all UnknownOpaque, no per-item
    allocation/scan) must be bit-identical to an explicit all-UO array,
    on the discovery pass, the speculative fused-fetch pass, and in a
    mixed batch alongside partially-resolved items."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tris = _tris(6, seed=13)

    def batches(st):
        return [[(t, st() if st else None) for t in tris[k:k + 2]]
                for k in range(0, 6, 2)]

    fresh = lambda: np.full(M, 3, np.uint8)
    want = [engine.resample_fine_item(tex, cfg, t, subdiv, fresh())
            for t in tris]
    for outs in (tp.classify_work_items_batches(tex, cfg, batches(None),
                                                subdiv),
                 tp.classify_work_items_batches(tex, cfg, batches(None),
                                                subdiv),  # speculative
                 tp.classify_work_items_batches(tex, cfg, batches(fresh),
                                                subdiv)):
        flat = [st for b in outs for st in b]
        for w, st in zip(want, flat):
            assert (st == w).all()

    # mixed batch: partially-resolved array + None items together
    half = want[0].copy()
    half[M // 2:] = 3
    mixed = [[(tris[0], half), (tris[1], None), (tris[2], fresh())]]
    outs = tp.classify_work_items_batches(tex, cfg, mixed, subdiv)[0]
    w0 = engine.resample_fine_item(tex, cfg, tris[0], subdiv, half.copy())
    assert (outs[0] == w0).all()
    assert (outs[1] == want[1]).all()
    assert (outs[2] == want[2]).all()


def test_auto_backend_small_routes_to_host():
    """backend='auto' must bake small workloads without device work and
    match the oracle exactly."""
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0]], np.float32),
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        max_subdivision_level=5)
    a = omm.bake(desc, backend="auto")
    n = omm.bake(desc)
    assert np.array_equal(a.array_data, n.array_data)
    assert np.array_equal(a.index_buffer, n.index_buffer)


@pytest.mark.slow
def test_nearest_filter_phase1_resolve():
    """Nearest-filter fast path: phase-1 resolves the off-contour bulk
    exactly; survivors handled by the host pass — full bake equality
    across backends on both binary and smooth-alpha content."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from vegetation_scene import foliage_atlas

    from omm_tpu.kernels.twophase import resolve_nearest_phase1

    for plane in (standard_circle(64, 64), foliage_atlas(128)):
        tex = omm.Texture([plane], omm.TextureFormat.FP32)
        cfg = _cfg(filter=omm.TextureFilterMode.Nearest)
        subdiv = 5
        M = omm.get_num_micro_triangles(subdiv)
        tris = _tris(3)
        items = [(t, np.full(M, 3, np.uint8)) for t in tris]
        res = resolve_nearest_phase1(tex, cfg, items, subdiv)
        assert res is not None
        n_resolved = 0
        for t, st in zip(tris, res):
            want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                             np.full(M, 3, np.uint8))
            resolved = st != 3
            n_resolved += int(resolved.sum())
            assert (st[resolved] == want[resolved]).all()
            # survivors complete exactly through the host pass
            done = engine.resample_fine_item(tex, cfg, t, subdiv, st.copy())
            assert (done == want).all()
        assert n_resolved > 0  # the bulk actually resolved on device

    # full bake equality through the wired-up backend path
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
        max_subdivision_level=5)
    desc.runtime_sampler.filter = omm.TextureFilterMode.Nearest
    a = omm.bake(desc, backend="numpy")
    b = omm.bake(desc, backend="jax")
    c = omm.bake(desc, backend="pallas")
    assert np.array_equal(a.array_data, b.array_data)
    assert np.array_equal(a.array_data, c.array_data)


@pytest.mark.slow
def test_twophase_no_pallas_fallback():
    """Without interpret-mode patching, Pallas cannot lower on CPU: the
    batch engine must transparently fall back to the XLA gather path and
    stay bit-exact."""
    from omm_tpu.kernels import twophase as tp

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 4
    M = omm.get_num_micro_triangles(subdiv)
    tris = _tris(2, seed=9)
    items = [(t, np.full(M, 3, np.uint8)) for t in tris]
    got = tp.classify_work_items_batch(tex, cfg, items, subdiv)
    for t, st in zip(tris, got):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st == want).all()


# ---------------------------------------------------------------------------
# Border address mode on the fast path
# ---------------------------------------------------------------------------

def _border_tex():
    """Edge texels just below the cutoff so borderAlpha-blending flips
    states when a triangle tip reaches past the last texel center."""
    plane = np.full((64, 64), 0.1, np.float32)
    plane[:, -1] = 0.45
    plane[-1, :] = 0.45
    plane[20:40, 20:40] = 0.9
    return omm.Texture([plane], omm.TextureFormat.FP32)


@pytest.mark.slow
def test_twophase_border_fast_path_sensitive(monkeypatch):
    """Edge-hugging triangle: fast-path admitted, bit-exact for border
    alphas on both sides of the cutoff, and the two fills must produce
    different states (proves border texels are actually read)."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = _border_tex()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    hi = 0.9953  # tip past the last texel center, seeds still in-bounds
    tri = np.array([[0.3, 0.3], [hi, 0.35], [0.35, hi]], np.float32)
    cfg_hi = _cfg(addr_mode=omm.TextureAddressMode.Border, border_alpha=0.9)
    lg = tp._group_level(tex, [tri], subdiv)
    assert tp._fast_path_ok(tex, cfg_hi, tri, subdiv, lg)

    wants = {}
    for ba in (0.1, 0.9):
        cfg = _cfg(addr_mode=omm.TextureAddressMode.Border, border_alpha=ba)
        got = tp.classify_work_items_batch(
            tex, cfg, [(tri, np.full(M, 3, np.uint8))], subdiv)[0]
        want = engine.resample_fine_item(tex, cfg, tri, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (got == want).all(), f"border ba={ba} mismatch"
        wants[ba] = want
    assert not (wants[0.1] == wants[0.9]).all(), \
        "test shape never reads border texels"


@pytest.mark.slow
def test_twophase_border_oob_seed_falls_back(monkeypatch):
    """Triangle crossing outside the texture: seed footprints go OOB, the
    fast path must decline (oracle seed clamps the border sentinel) and
    the batch engine's fallback stays bit-exact."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = _border_tex()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tri = np.array([[-0.2, 0.1], [0.3, 1.2], [1.1, 0.5]], np.float32)
    cfg = _cfg(addr_mode=omm.TextureAddressMode.Border, border_alpha=0.9)
    lg = tp._group_level(tex, [tri], subdiv)
    assert not tp._fast_path_ok(tex, cfg, tri, subdiv, lg)
    got = tp.classify_work_items_batch(
        tex, cfg, [(tri, np.full(M, 3, np.uint8))], subdiv)[0]
    want = engine.resample_fine_item(tex, cfg, tri, subdiv,
                                     np.full(M, 3, np.uint8))
    assert (got == want).all()


@pytest.mark.slow
def test_nearest_phase1_border_crossing():
    """Nearest filter has no seed sample, so Border rides phase-1 even for
    triangles crossing outside the texture; resolved states must match the
    oracle and survivors stay UnknownOpaque."""
    from omm_tpu.kernels import twophase as tp

    tex = _border_tex()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tri = np.array([[-0.2, 0.1], [0.3, 1.2], [1.1, 0.5]], np.float32)
    for ba in (0.1, 0.9):
        cfg = _cfg(addr_mode=omm.TextureAddressMode.Border,
                   filter=omm.TextureFilterMode.Nearest, border_alpha=ba)
        res = tp.resolve_nearest_phase1(
            tex, cfg, [(tri, np.full(M, 3, np.uint8))], subdiv)
        assert res is not None
        st = res[0]
        resolved = st != 3
        assert resolved.sum() > 0
        want = engine.resample_fine_item(tex, cfg, tri, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st[resolved] == want[resolved]).all()


@pytest.mark.slow
def test_mxu_border_gate_and_parity():
    """MXU engine: edge-hugging Border item admitted + bit-exact; item
    with OOB seed footprints declined."""
    from omm_tpu.kernels.mxu_classify import classify_work_item_mxu

    tex = _border_tex()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    cfg = _cfg(addr_mode=omm.TextureAddressMode.Border, border_alpha=0.9)
    tri = np.array([[0.3, 0.3], [0.9953, 0.35], [0.35, 0.9953]], np.float32)
    out = classify_work_item_mxu(tex, cfg, tri, subdiv,
                                 np.full(M, 3, np.uint8))
    assert out is not None
    want = engine.resample_fine_item(tex, cfg, tri, subdiv,
                                     np.full(M, 3, np.uint8))
    assert (np.asarray(out) == want).all()

    crossing = np.array([[-0.2, 0.1], [0.3, 1.2], [1.1, 0.5]], np.float32)
    assert classify_work_item_mxu(tex, cfg, crossing, subdiv,
                                  np.full(M, 3, np.uint8)) is None


def test_nearest_survivors_device_pass():
    """classify_nearest_survivors (kernels/jax_classify.py): the device
    fine pass over the contour survivors is bit-exact with the host
    nearest pass across address modes, multi-mip chains and UNORM8."""
    from omm_tpu.kernels.jax_classify import classify_nearest_survivors
    from omm_tpu.kernels.twophase import resolve_nearest_phase1

    subdiv = 4
    M = omm.get_num_micro_triangles(subdiv)
    tris = _tris(2, seed=3)
    # an out-of-range triangle exercising wrap/mirror/border coords
    tris.append(np.array([[-0.4, -0.2], [0.3, 1.5], [1.3, 0.4]],
                         np.float32))

    rng = np.random.RandomState(5)
    mips2 = [rng.rand(64, 64).astype(np.float32),
             rng.rand(32, 32).astype(np.float32)]
    cases = [
        (omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32),
         dict()),
        (omm.Texture([sine_unorm8(64, 64)], omm.TextureFormat.UNORM8),
         dict()),
        (omm.Texture(mips2, omm.TextureFormat.FP32), dict()),
        (omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32),
         dict(addr_mode=omm.TextureAddressMode.Wrap)),
        (omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32),
         dict(addr_mode=omm.TextureAddressMode.MirrorOnce)),
        (omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32),
         dict(addr_mode=omm.TextureAddressMode.Border, border_alpha=0.7)),
        (omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32),
         dict(fmt=omm.Format.OC1_2_State,
              cutoff_le=omm.OpacityState.Transparent)),
    ]
    for tex, over in cases:
        cfg = _cfg(filter=omm.TextureFilterMode.Nearest, **over)
        for t in tris:
            init = np.full(M, 3, np.uint8)
            # realistic survivor sets: whatever phase-1 leaves unresolved
            res = resolve_nearest_phase1(tex, cfg, [(t, init)], subdiv)
            st0 = res[0] if res is not None else init
            got = classify_nearest_survivors(tex, cfg, t, subdiv,
                                             st0.copy())
            want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                             st0.copy())
            assert (got == want).all(), (over, t)
            # and from a fully-unresolved start (all M on device)
            got_all = classify_nearest_survivors(tex, cfg, t, subdiv,
                                                 init.copy())
            want_all = engine.resample_fine_item(tex, cfg, t, subdiv,
                                                 init.copy())
            assert (got_all == want_all).all(), (over, t)


def test_native_reconstruct_matches_numpy_replay():
    """finish_compact's C++ fast path (native.reconstruct_states) must be
    byte-identical to the numpy replay AND to the synchronous two-sync
    result, in all-active and partial-active modes."""
    from omm_tpu import native
    from omm_tpu.kernels import twophase as tp
    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    tex = omm.Texture([standard_circle(128, 128)], omm.TextureFormat.FP32)
    rng = np.random.RandomState(3)
    tris = [np.array([b + [0.05, 0.1], b + [0.1, 0.6], b + [0.6, 0.55]],
                     dtype=np.float32)
            for b in (rng.rand(2).astype(np.float32) * 0.3
                      for _ in range(5))]
    cfg = _cfg()
    subdiv = 6
    M = omm.get_num_micro_triangles(subdiv)
    for act_mode in ("all", "partial"):
        items = []
        for t in tris:
            st = np.full(M, 3, np.uint8)
            if act_mode == "partial":
                st[rng.rand(M) < 0.3] = rng.randint(0, 3)
            items.append((t, st))
        got = tp.classify_work_items_batch(tex, cfg, items, subdiv)
        ctx = tp._BatchCtx(tex, cfg, items, subdiv,
                           list(range(len(items))), [None] * len(items))
        p = tp._enqueue_batch_spec(ctx)
        assert p is not None
        dev, Cs_cap, K_cap = p
        buf = np.asarray(dev)
        m = len(ctx.levels) - 1
        mrow = buf[:4 * (m + 2 + tex.mip_count)].view(np.int32)
        assert int(mrow[m + 1]) == 0
        Cs = [int(x) for x in mrow[:m]]
        K = int(mrow[m])

        ctx.finish_compact(buf, Cs_cap, K_cap, Cs, K)
        out_native = [o.copy() for o in ctx.out]

        orig = native.reconstruct_states
        try:
            native.reconstruct_states = lambda *a, **k: None
            ctx2 = tp._BatchCtx(tex, cfg, items, subdiv,
                                list(range(len(items))),
                                [None] * len(items))
            ctx2.finish_compact(buf, Cs_cap, K_cap, Cs, K)
        finally:
            native.reconstruct_states = orig
        for a, b, g in zip(out_native, ctx2.out, got):
            assert np.array_equal(a, b), act_mode
            assert np.array_equal(a, g), act_mode


def test_span_windows_batched_equals_scalar():
    """The vectorized host-prep _span_windows must reproduce the scalar
    _span_window per element (same fp64 op order) across random
    geometry, levels and mip sizes — the capacity buckets and class-
    plane cache keys depend on exact equality."""
    from omm_tpu.kernels import twophase as tp

    rng = np.random.RandomState(11)
    mips = [rng.rand(1 << k, 1 << (k + 1)).astype(np.float32)
            for k in (9, 8, 7)]
    tex = omm.Texture([mips[0]], omm.TextureFormat.FP32)
    uvs = (rng.rand(64, 3, 2).astype(np.float32) * 4.0 - 1.5)
    for level in (1, 4, 9, 12):
        Hb, Wb = tp._span_windows(tex, uvs, level, 0)
        for n in range(len(uvs)):
            hs, ws = tp._span_window(tex, uvs[n], level, 0)
            assert (hs, ws) == (int(Hb[n]), int(Wb[n])), (level, n)

    # hardcoded oracle values pin the fp64 op order + eps (+2) semantics
    # themselves (both code paths share the implementation, so the
    # cross-check above alone cannot catch a semantics change)
    fixed = [
        (np.array([[0.1, 0.2], [0.15, 0.9], [0.8, 0.75]], np.float32),
         {1: (182, 361), 4: (25, 47), 9: (3, 4)}),
        (np.array([[-0.5, 0.0], [1.5, 0.25], [0.5, 2.0]], np.float32),
         {1: (515, 1027), 4: (67, 131), 9: (5, 7)}),
        (np.array([[0.333, 0.111], [0.334, 0.112], [0.3335, 0.1115]],
                  np.float32),
         {1: (3, 3), 4: (3, 3), 9: (3, 3)}),
    ]
    for uv, want in fixed:
        for level, hw in want.items():
            assert tp._span_window(tex, uv, level, 0) == hw, (uv, level)


def test_fast_path_mask_equals_scalar():
    """The vectorized admission filter _fast_path_mask must reproduce
    _fast_path_ok per item: degenerate triangles, windows larger than a
    tile, far-out-of-range UVs, tiny triangles, every address mode."""
    from omm_tpu.kernels import twophase as tp

    rng = np.random.RandomState(23)
    tex = omm.Texture([standard_circle(256, 256)], omm.TextureFormat.FP32)
    uvs = []
    for _ in range(40):
        b = rng.rand(2).astype(np.float32) * 0.5
        uvs.append(np.stack([b + rng.rand(2).astype(np.float32) * 0.4
                             for _ in range(3)]))
    # adversarial items: degenerate (point + line), huge span (window >
    # TILE at low subdiv), far outside [0,1]^2, exactly-on-boundary
    uvs.append(np.array([[0.3, 0.4]] * 3, np.float32))
    uvs.append(np.array([[0.1, 0.1], [0.5, 0.5], [0.9, 0.9]], np.float32))
    uvs.append(np.array([[-8.0, -8.0], [9.0, -8.0], [0.5, 9.0]],
                        np.float32))
    uvs.append(np.array([[-3.0, 0.1], [4.0, 0.2], [0.5, 3.5]], np.float32))
    uvs.append(np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32))
    uv_arr = np.stack(uvs)

    for mode in (omm.TextureAddressMode.Clamp, omm.TextureAddressMode.Wrap,
                 omm.TextureAddressMode.Border):
        cfg = _cfg(addr_mode=mode)
        for subdiv, lg in ((1, 1), (4, 2), (6, 3), (9, 4)):
            mask = tp._fast_path_mask(tex, cfg, uv_arr, subdiv, lg)
            want = [tp._fast_path_ok(tex, cfg, u, subdiv, lg) for u in uvs]
            assert mask.tolist() == want, (mode, subdiv)

    # nearest filter / disable_level_line: everything rejected
    cfg_n = _cfg(filter=omm.TextureFilterMode.Nearest)
    assert not tp._fast_path_mask(tex, cfg_n, uv_arr, 6, 3).any()


def test_twophase_fetch_chunk_grid(monkeypatch):
    """The chunked fused fetch must be bit-exact for every chunking
    shape: 1 chunk (fully fused), 2 (uneven 2+1 over 3 live batches),
    and 4 (single-payload chunks, no concat), including a batch whose
    items all take the slow path (no live payload, chunks skew)."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tris = _tris(6, seed=17)
    degen = np.array([[0.1, 0.1], [0.5, 0.5], [0.9, 0.9]], np.float32)

    def batches():
        return ([[(t, None) for t in tris[k:k + 2]]
                 for k in range(0, 6, 2)]
                + [[(degen, None)]])  # all-slow batch: ctx is None

    want = [engine.resample_fine_item(tex, cfg, t, subdiv,
                                      np.full(M, 3, np.uint8))
            for t in tris + [degen]]
    for nch in ("1", "2", "4"):
        monkeypatch.setenv("OMM_TP_FETCH_CHUNKS", nch)
        tp.classify_work_items_batches(tex, cfg, batches(), subdiv)
        outs = tp.classify_work_items_batches(tex, cfg, batches(), subdiv)
        flat = [st for b in outs for st in b]
        assert len(flat) == 7
        for w, st in zip(want, flat):
            assert (st == w).all(), f"chunks={nch}"


def test_linear_phase1_and_survivors_oracle():
    """Pure-XLA 'phase-1 + survivors' pair (the ComputeOnly engine and
    the Pallas-unavailable fallback): the flat window resolve classifies
    only exactly, and classify_linear_survivors completes the contour to
    full oracle equality — single-mip binary, multi-mip smooth, border
    mode, and partially-resolved inputs."""
    from omm_tpu.kernels.jax_classify import classify_linear_survivors
    from omm_tpu.kernels.twophase import resolve_linear_phase1

    # true box-filtered mip chain of a smooth-edged shape: multi-mip
    # resolution requires every mip one-sided, so mips must correlate
    mips = [standard_circle(64, 64)]
    while mips[-1].shape[0] >= 32:
        m = mips[-1]
        mips.append((m[0::2, 0::2] + m[1::2, 0::2] + m[0::2, 1::2]
                     + m[1::2, 1::2]) * np.float32(0.25))

    cases = [
        (omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32),
         _cfg()),
        (omm.Texture(mips, omm.TextureFormat.FP32), _cfg()),
        (omm.Texture([standard_circle(48, 48)], omm.TextureFormat.FP32),
         _cfg(addr_mode=omm.TextureAddressMode.Border, border_alpha=0.8)),
    ]
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    for tex, cfg in cases:
        tris = _tris(3)
        items = [(t, np.full(M, 3, np.uint8)) for t in tris]
        pre = resolve_linear_phase1(tex, cfg, items, subdiv)
        if pre is None:
            # border-mode seed footprints may reject items; the caller
            # falls back — nothing to assert for this case
            continue
        n_resolved = 0
        for t, st in zip(tris, pre):
            want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                             np.full(M, 3, np.uint8))
            resolved = st != 3
            n_resolved += int(resolved.sum())
            assert (st[resolved] == want[resolved]).all()
            done = classify_linear_survivors(tex, cfg, t, subdiv, st)
            assert (done == want).all()
        assert n_resolved > 0


def test_linear_survivors_partial_states():
    """classify_linear_survivors only touches UnknownOpaque entries and
    matches the oracle on them (resumed-bake semantics)."""
    from omm_tpu.kernels.jax_classify import classify_linear_survivors

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    t = _tris(1)[0]
    want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                     np.full(M, 3, np.uint8))
    rng = np.random.RandomState(3)
    st = want.copy()
    redo = rng.rand(M) < 0.3
    st[redo] = 3  # back to UnknownOpaque
    frozen = ~redo
    sentinel = st[frozen].copy()
    got = classify_linear_survivors(tex, cfg, t, subdiv, st)
    assert (got[frozen] == sentinel).all()  # untouched
    assert (got == want).all()


def test_packed_sides_roundtrip():
    """The phase-1 side maps cross the tunnel packed 4-per-byte
    (_linear_sides_packed / _nearest_sides_packed); _unpack_sides must
    invert the device packing bit-exactly over the full {-1, 0, +1}
    domain, and the packed linear resolve must equal the unpacked form
    on a real workload."""
    from omm_tpu.kernels import twophase as tp

    rng = np.random.RandomState(3)
    side = rng.randint(-1, 2, size=(5, 256)).astype(np.int8)
    code = (side + 1).astype(np.uint8).reshape(5, 64, 4)
    packed = (code[..., 0] | (code[..., 1] << 2) | (code[..., 2] << 4)
              | (code[..., 3] << 6))
    assert (tp._unpack_sides(packed, 256) == side).all()

    # packed vs unpacked device resolve on a real item set
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 4
    items = [(t, None) for t in _tris(3)]
    got = tp.resolve_linear_phase1(tex, cfg, items, subdiv)
    assert got is not None
    # reproduce via the unpacked jit directly
    uv_arr = np.stack([t for t, _ in items])
    mips, pads, cls_planes, periods = [], [], [], []
    for mip in range(tex.mip_count):
        Hbs, Wbs = tp._span_windows(tex, uv_arr, subdiv, mip)
        Hb, Wb = int(Hbs.max()), int(Wbs.max())
        TSA = tp.TILE + max(Hb + 2, Wb + 2)
        period = tp._period_for(tex, cfg.addr_mode, mip)
        periods.append(period)
        mips.append(tex.size(mip))
        pads.append(TSA)
        cls_planes.append(tp._cls_cached(
            tex, mip, cfg.addr_mode, TSA, TSA, Hb, Wb,
            float(cfg.alpha_cutoff), tp.PHASE1_MARGIN,
            float(getattr(cfg, "border_alpha", 0.0)), period))
    import jax.numpy as jnp
    side_ref = np.asarray(tp._linear_sides(
        tuple(cls_planes), jnp.asarray(uv_arr.reshape(3, 6)), tp._fz0(),
        subdiv=subdiv, mips=tuple(mips), pads=tuple(pads),
        periods=tuple(periods)))
    M = omm.get_num_micro_triangles(subdiv)
    st_gt = np.uint8(int(cfg.cutoff_gt))
    st_le = np.uint8(int(cfg.cutoff_le))
    for t in range(3):
        want = np.full(M, 3, np.uint8)
        want[side_ref[t] == 1] = st_gt
        want[side_ref[t] == -1] = st_le
        assert (got[t] == want).all()


def test_linear_survivors_batch_parity():
    """classify_linear_survivors_batch compacts every item's survivors
    into one dispatch stream; output must be byte-identical to the
    per-item form (and the oracle) across the routing zoo: phase-1
    pre-resolved contours, an all-UnknownOpaque item (dense route), a
    zero-survivor item (passthrough), and a random partial resume."""
    from omm_tpu.kernels.jax_classify import (
        classify_linear_survivors, classify_linear_survivors_batch)
    from omm_tpu.kernels.twophase import resolve_linear_phase1

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tris = _tris(4)
    want = [engine.resample_fine_item(tex, cfg, t, subdiv,
                                      np.full(M, 3, np.uint8))
            for t in tris]

    pre = resolve_linear_phase1(
        tex, cfg, [(t, np.full(M, 3, np.uint8)) for t in tris[:2]], subdiv)
    assert pre is not None
    rng = np.random.RandomState(7)
    partial = want[3].copy()
    partial[rng.rand(M) < 0.3] = 3
    work = [(tris[0], pre[0]),                       # contour survivors
            (tris[1], pre[1]),                       # contour survivors
            (tris[2], np.full(M, 3, np.uint8)),      # all-UO: dense route
            (tris[3], want[3].copy()),               # zero survivors
            (tris[3], partial)]                      # partial resume
    got = classify_linear_survivors_batch(tex, cfg, work, subdiv)
    exp = want[:4] + [want[3]]
    for g, w in zip(got, exp):
        assert (g == w).all()
    # batch-of-one == the historical per-item entry point
    one = classify_linear_survivors(tex, cfg, tris[0], subdiv,
                                    pre[0].copy())
    assert (one == want[0]).all()


def test_linear_phase1_preconditions_reject():
    """Geometry whose micro-tri window exceeds a tile fails the
    preconditions -> None (callers fall back to the dense path).  (Wrap
    multi-repeat UVs are NO LONGER a rejection: the periodic fast path
    takes them — see test_wrap_multirepeat_fast_path.)"""
    from omm_tpu.kernels.twophase import resolve_linear_phase1

    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    cfg = _cfg(addr_mode=omm.TextureAddressMode.Wrap)
    # at subdiv 2 this ~56-period span makes the per-micro-tri window
    # ~450 texels > TILE
    subdiv = 2
    M = omm.get_num_micro_triangles(subdiv)
    t = np.array([[40.0, 40.1], [40.1, 95.5], [95.6, 95.4]], np.float32)
    assert resolve_linear_phase1(
        tex, cfg, [(t, np.full(M, 3, np.uint8))], subdiv) is None

    # Clamp stays containment-gated: far-out UVs reject
    cfg_c = _cfg(addr_mode=omm.TextureAddressMode.Clamp)
    t2 = np.array([[40.0, 40.1], [40.1, 40.5], [40.6, 40.4]], np.float32)
    assert resolve_linear_phase1(
        tex, cfg_c, [(t2, np.full(4 ** 4, 3, np.uint8))], 4) is None


# ---------------------------------------------------------------------------
# wrapped / tiled UVs on the fast path (texture.h:34-91 periodicity; the
# reference GPU tolerates wrap modes via its 11x-scaled viewport,
# bake_gpu_impl.cpp:716-723 — here via period planes + modular anchors)
# ---------------------------------------------------------------------------

def _wrap_tris(scale=3.0, offset=(2.0, 1.0), n=4, seed=11):
    """Multi-repeat UV triangles: span several address-mode periods."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        b = (rng.rand(2).astype(np.float32) * 0.5 - 0.25) * scale \
            + np.asarray(offset, np.float32)
        out.append(np.stack(
            [b + rng.rand(2).astype(np.float32) * scale * 0.8
             for _ in range(3)]))
    return out


@pytest.mark.parametrize("mode", [omm.TextureAddressMode.Wrap,
                                  omm.TextureAddressMode.Mirror])
@pytest.mark.parametrize("size", [64, 48])
def test_wrap_multirepeat_fast_path(mode, size):
    """Multi-repeat wrap/mirror UVs take the two-phase fast path (mask
    accepts) and the result is bit-exact vs the oracle — pow2 and
    non-pow2, including negative-UV footprints where periodicity holds
    (non-pow2 Wrap keeps negative footprints on the slow path: the
    reference's uint32-cast quirk, texture.h:42, is aperiodic there)."""
    from omm_tpu.kernels import twophase as tp

    rng = np.random.RandomState(5)
    tex = omm.Texture([rng.rand(size, size).astype(np.float32)],
                      omm.TextureFormat.FP32)
    cfg = _cfg(addr_mode=mode)
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tris = _wrap_tris() + [
        np.array([[-1.7, -0.4], [0.2, 1.9], [1.4, -2.2]], np.float32)]

    lg = tp._group_level(tex, tris, subdiv)
    mask = tp._fast_path_mask(tex, cfg, np.stack(tris), subdiv, lg)
    nonpow2_wrap = (mode == omm.TextureAddressMode.Wrap and size == 48)
    # all positive-footprint items admitted; the negative-footprint one
    # admitted except under non-pow2 Wrap
    assert mask[:-1].all()
    assert bool(mask[-1]) == (not nonpow2_wrap)

    got = tp.classify_work_items_batch(tex, cfg, [(t, None) for t in tris],
                                       subdiv)
    for k, t in enumerate(tris):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (got[k] == want).all(), k


def test_wrap_multirepeat_multimip_and_phase1():
    """Wrap multi-repeat over a mip chain: the hierarchical engine AND
    the flat phase-1 + survivors pair both match the oracle."""
    from omm_tpu.kernels import twophase as tp
    from omm_tpu.kernels.jax_classify import classify_linear_survivors

    rng = np.random.RandomState(6)
    mips = [rng.rand(64, 64).astype(np.float32)]
    while mips[-1].shape[0] >= 32:
        m = mips[-1]
        mips.append((m[0::2, 0::2] + m[1::2, 0::2] + m[0::2, 1::2]
                     + m[1::2, 1::2]) * np.float32(0.25))
    tex = omm.Texture(mips, omm.TextureFormat.FP32)
    cfg = _cfg(addr_mode=omm.TextureAddressMode.Wrap)
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tris = _wrap_tris(n=3, seed=12)

    got = tp.classify_work_items_batch(tex, cfg, [(t, None) for t in tris],
                                       subdiv)
    pre = tp.resolve_linear_phase1(
        tex, cfg, [(t, np.full(M, 3, np.uint8)) for t in tris], subdiv)
    assert pre is not None
    for k, t in enumerate(tris):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (got[k] == want).all(), k
        resolved = pre[k] != 3
        assert (pre[k][resolved] == want[resolved]).all()
        done = classify_linear_survivors(tex, cfg, t, subdiv, pre[k])
        assert (done == want).all()


@pytest.mark.parametrize("mode", [omm.TextureAddressMode.Wrap,
                                  omm.TextureAddressMode.Mirror])
def test_wrap_multirepeat_nearest_phase1(mode):
    """Nearest-filter phase-1 admits periodic multi-repeat UVs too:
    resolved micro-tris exact, survivors complete to oracle equality."""
    from omm_tpu.kernels import twophase as tp

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg(addr_mode=mode, filter=omm.TextureFilterMode.Nearest)
    subdiv = 6
    M = omm.get_num_micro_triangles(subdiv)
    tris = _wrap_tris(n=2, seed=13) + [
        np.array([[-1.7, -0.4], [0.2, 1.9], [1.4, -2.2]], np.float32)]
    items = [(t, np.full(M, 3, np.uint8)) for t in tris]
    res = tp.resolve_nearest_phase1(tex, cfg, items, subdiv)
    assert res is not None
    n_resolved = 0
    for t, st in zip(tris, res):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        resolved = st != 3
        n_resolved += int(resolved.sum())
        assert (st[resolved] == want[resolved]).all()
        assert (engine.resample_fine_item(tex, cfg, t, subdiv, st)
                == want).all()
    assert n_resolved > 0


def test_megachain_bit_exact(monkeypatch):
    """OMM_TP_MEGACHAIN=1 fuses all sub-batches of a call into ONE
    dispatch + ONE fetch (link-economics lever for the tunnel-attached
    chip); results must be byte-identical to the per-batch pipeline.
    Also exercises the cold-cache fallback (first call has no caps entry
    -> per-batch path) and the warm fused path (second call)."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    tris = _tris(12, seed=31)
    batches = [[(t, None) for t in tris[k:k + 4]] for k in range(0, 12, 4)]

    want = tp.classify_work_items_batches(tex, cfg, batches, subdiv)

    monkeypatch.setenv("OMM_TP_MEGACHAIN", "1")
    got_cold = tp.classify_work_items_batches(tex, cfg, batches, subdiv)
    got_warm = tp.classify_work_items_batches(tex, cfg, batches, subdiv)
    for wb, cb, hb in zip(want, got_cold, got_warm):
        for w, c, h in zip(wb, cb, hb):
            assert (w == c).all() and (w == h).all()


def test_address_mode_periodicity():
    """The wrapped-anchor construction is sound iff GetTexCoord is
    periodic: Wrap with period w (pow2: including negative coords via the
    uint32 cast; non-pow2: non-negative coords only), Mirror with period
    2w everywhere (the fp32 |c+0.5| quirk reflects around -0.5, which IS
    the periodic extension).  Brute-force over several periods."""
    from omm_tpu.texture import get_tex_coord

    for w in (32, 48):
        size = np.array([w, w], np.int32)
        log2 = np.array([int(np.log2(w)) if (w & (w - 1)) == 0 else 0] * 2,
                        np.int32)
        pow2 = (w & (w - 1)) == 0
        lo = -3 * w if pow2 else 0
        c = np.arange(lo, 5 * w, dtype=np.int32)
        cc = np.stack([c, c], -1)
        for mode, period in ((omm.TextureAddressMode.Wrap, w),
                             (omm.TextureAddressMode.Mirror, 2 * w)):
            if mode == omm.TextureAddressMode.Mirror:
                c2 = np.arange(-3 * w, 5 * w, dtype=np.int32)
                cc2 = np.stack([c2, c2], -1)
            else:
                cc2 = cc
            got = get_tex_coord(mode, cc2, size, log2, pow2)
            canon = get_tex_coord(
                mode, np.mod(cc2, period).astype(np.int32), size, log2, pow2)
            assert np.array_equal(got, canon), (mode, w)


@pytest.mark.slow
def test_concurrent_batch_calls_thread_safe(monkeypatch):
    """Two threads driving classify_work_items_batches on the SAME
    texture concurrently (a bake server's shape): shared caches (class
    planes, caps buckets) and the per-call enqueue/fetch machinery must
    stay bit-exact under interleaving."""
    import concurrent.futures as cf

    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    tris_a = _tris(4, seed=21)
    tris_b = _tris(4, seed=22)

    def run(tris):
        batches = [[(t, None) for t in tris[k:k + 2]]
                   for k in range(0, len(tris), 2)]
        outs = tp.classify_work_items_batches(tex, cfg, batches, subdiv)
        return [st for b in outs for st in b]

    run(tris_a)  # warm compiles + caps in one thread first
    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(run, tris_a)
        fb = pool.submit(run, tris_b)
        got_a, got_b = fa.result(), fb.result()
    for tris, got in ((tris_a, got_a), (tris_b, got_b)):
        for t, st in zip(tris, got):
            want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                             np.full(M, 3, np.uint8))
            assert (st == want).all()


@pytest.mark.parametrize("bf16x3", ["0", "1"])
def test_xla_exact_engine_parity_small(bf16x3, monkeypatch):
    """The ComputeOnly exact stage (`exact_engine="xla"`:
    pallas_classify._run_v3_xla, the kernel body through pure XLA —
    reference role bake_gpu_impl.cpp:253-267 compute path) rides the
    full two-phase pipeline and must (a) never touch the Mosaic kernel
    and (b) match the per-item oracle byte for byte — with the exact
    bf16x3 gather split both off (the measured v5e default) and on
    (OMM_TP_BF16X3=1, kept for other hardware)."""
    from omm_tpu.kernels import pallas_classify as pk
    from omm_tpu.kernels import twophase as tp

    monkeypatch.setenv("OMM_TP_BF16X3", bf16x3)
    orig = pk._run_v3
    def boom(*a, **k):
        raise AssertionError("Mosaic kernel invoked on the xla engine")
    pk._run_v3 = boom
    try:
        tex = omm.Texture([standard_circle(48, 48)],
                          omm.TextureFormat.FP32)
        cfg = _cfg()
        subdiv = 4
        M = omm.get_num_micro_triangles(subdiv)
        tris = _tris(3, seed=11)
        items = [(t, None) for t in tris]
        got = tp.classify_work_items_batches(
            tex, cfg, [items], subdiv, exact_engine="xla")[0]
        for t, st in zip(tris, got):
            want = engine.resample_fine_item(
                tex, cfg, t, subdiv, np.full(M, 3, np.uint8))
            assert (st == want).all(), (st != want).sum()
    finally:
        pk._run_v3 = orig


@pytest.mark.slow
def test_xla_exact_engine_parity_modes(monkeypatch):
    """xla-vs-pallas engine equality on the shapes that stress the exact
    stage: multi-repeat Wrap UVs (period planes), a multi-mip chain
    (early-unknown-exit count accumulation), and a 2-state format —
    plus byte equality against the default engine's output."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    mips = [sine_fp32(64, 64)]
    while mips[-1].shape[0] >= 32:
        m = mips[-1]
        mips.append((m[0::2, 0::2] + m[1::2, 0::2] + m[0::2, 1::2]
                     + m[1::2, 1::2]) * np.float32(0.25))
    cases = [
        (omm.Texture([sine_fp32(64, 64)], omm.TextureFormat.FP32),
         _cfg(addr_mode=omm.TextureAddressMode.Wrap),
         [np.array([[0.1, -0.2], [0.2, 1.1], [1.3, 0.7]], np.float32)]),
        (omm.Texture(mips, omm.TextureFormat.FP32), _cfg(), _tris(3)),
        (omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32),
         _cfg(fmt=omm.Format.OC1_2_State), _tris(2, seed=5)),
    ]
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    for tex, cfg, tris in cases:
        items = lambda: [(t, None) for t in tris]
        got_x = tp.classify_work_items_batches(
            tex, cfg, [items()], subdiv, exact_engine="xla")[0]
        got_p = tp.classify_work_items_batches(
            tex, cfg, [items()], subdiv, exact_engine="pallas")[0]
        for t, sx, sp in zip(tris, got_x, got_p):
            want = engine.resample_fine_item(
                tex, cfg, t, subdiv, np.full(M, 3, np.uint8))
            assert (sx == want).all(), (sx != want).sum()
            assert (sp == want).all(), (sp != want).sum()


def test_bf16x3_split_gate_and_exactness():
    """The exact-gather bf16x3 split (pallas_classify._kernel_body column
    select) is only admissible when bf16x3_safe passes; for every value
    the gate admits, the 3-term reconstruction must be bit-exact.  Fuzz
    over random fp32 bit patterns plus the boundary region."""
    import ml_dtypes
    from omm_tpu.kernels.pallas_classify import bf16x3_safe

    bf = ml_dtypes.bfloat16
    rng = np.random.RandomState(3)
    bits = rng.randint(0, 2 ** 32, size=500_000,
                       dtype=np.uint64).astype(np.uint32)
    x = bits.view(np.float32)
    # boundary cases around the gate's thresholds
    extra = np.array([0.0, -0.0, 2.0 ** -110, -(2.0 ** -110),
                      2.0 ** -109, 2.0 ** 126, -(2.0 ** 126),
                      1.0, 1.0 - 2.0 ** -24, np.float32(1 / 255.0)],
                     np.float32)
    x = np.concatenate([x, extra])
    hi = x.astype(bf)
    with np.errstate(all="ignore"):
        r1 = x - hi.astype(np.float32)
        lo = r1.astype(bf)
        lo2 = (r1 - lo.astype(np.float32)).astype(bf)
        rec = (hi.astype(np.float32) + lo.astype(np.float32)) \
            + lo2.astype(np.float32)
    admitted = np.array([bf16x3_safe(np.array([v], np.float32))
                         for v in x[-10:]])
    # spot-check the gate on the boundary block, then the global law:
    # gate admits => reconstruction exact
    assert admitted.tolist() == [True, True, True, True, True, True,
                                 True, True, True, True]
    a = np.abs(x)
    gate = np.isfinite(x) & ((a == 0)
                             | ((a >= 2.0 ** -110) & (a < 2.0 ** 127)))
    exact = rec == x
    assert (exact | ~gate).all(), \
        int((~exact & gate).sum())
    # and the gate genuinely rejects something reconstructible only
    # approximately (denormal-floor region)
    assert not bf16x3_safe(np.array([8e-36], np.float32))


def test_unsafe_plane_falls_back_to_highest(monkeypatch):
    """A plane carrying sub-2^-110 magnitudes must keep the fp32-HIGHEST
    matmul and stay oracle-exact end to end."""
    from omm_tpu.kernels import twophase as tp

    _interp_pallas(monkeypatch)
    plane = standard_circle(48, 48)
    plane[7, 9] = np.float32(8e-36)   # below the bf16x3 floor
    plane[11, 3] = np.float32(-3e-38)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    cfg = _cfg()
    subdiv = 4
    M = omm.get_num_micro_triangles(subdiv)
    tris = _tris(2, seed=13)
    got = tp.classify_work_items_batches(
        tex, cfg, [[(t, None) for t in tris]], subdiv)[0]
    for t, st in zip(tris, got):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st == want).all()
