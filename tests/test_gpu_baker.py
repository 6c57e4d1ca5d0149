"""GPU-baker analog: dispatch-chain API parity tests.

Oracles from the reference GPU suite (test_omm_bake_gpu.cpp); histogram
self-consistency mirrors util/omm_histogram.cpp:20-122; the 40-case
fixture matrix mirrors the reference's instantiation grid
(test_omm_bake_gpu.cpp:1527-1572)."""
import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import gpu
from omm_tpu.stats import get_stats

from fixtures import hexagons, mandelbrot, sine_fp32, standard_circle


def validate_histograms(res: omm.BakeResult):
    """util/omm_histogram.cpp: histograms must match a recount from the
    desc array / index buffer."""
    from collections import Counter
    arr = Counter((d.subdivision_level, d.format) for d in res.desc_array)
    got = Counter()
    for u in res.desc_array_histogram:
        assert u.count != 0
        got[(u.subdivision_level, u.format)] += u.count
    assert arr == got

    idx = Counter()
    for i in range(res.index_count):
        v = int(res.index_buffer[i])
        if v < 0:
            continue
        d = res.desc_array[v]
        idx[(d.subdivision_level, d.format)] += 1
    got = Counter()
    for u in res.index_histogram:
        assert u.count != 0
        got[(u.subdivision_level, u.format)] += u.count
    assert idx == got


def _dispatch(plane, subdiv, backend_override="numpy", **kw):
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    cfg = gpu.DispatchConfigDesc(
        alpha_texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32),
        index_count=6,
        max_subdivision_level=subdiv,
        dynamic_subdivision_scale=0.0,
        **kw)
    pipe = gpu.Pipeline()
    info = pipe.get_pre_dispatch_info(cfg)
    chain = pipe.dispatch(cfg, backend=backend_override)
    assert [p.label for p in chain.passes[:3]] == ["Clear", "Init", "WorkSetup"]
    res, post = chain.execute()
    assert post.out_omm_array_size_in_bytes <= info.out_omm_array_size_in_bytes
    validate_histograms(res)
    return res, post, info


def test_gpu_circle():
    """test_omm_bake_gpu.cpp:897-921 (GPU default = ForceOpaque promotion)."""
    res, post, info = _dispatch(standard_circle(1024, 1024), 4)
    s = get_stats(res)
    assert (s.total_opaque, s.total_transparent, s.total_unknown_transparent,
            s.total_unknown_opaque) == (204, 219, 0, 89)


def test_gpu_post_dispatch_stats():
    res, post, _ = _dispatch(
        standard_circle(1024, 1024), 4,
        bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                    | gpu.GpuBakeFlags.EnablePostDispatchInfoStats))
    s = get_stats(res)
    assert post.out_stats_total_opaque_count == s.total_opaque
    assert post.out_stats_total_unknown_count == (
        s.total_unknown_opaque + s.total_unknown_transparent)
    assert post.out_omm_array_size_in_bytes == len(res.array_data)


def test_gpu_disable_special_indices():
    plane = np.full((64, 64), 0.9, np.float32)
    res, _, _ = _dispatch(plane, 2,
                          bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                                      | gpu.GpuBakeFlags.DisableSpecialIndices))
    assert (res.index_buffer >= 0).all()
    res2, _, _ = _dispatch(plane, 2)
    assert (res2.index_buffer == int(omm.SpecialIndex.FullyOpaque)).all()


def test_gpu_dedup_flag():
    plane = standard_circle(128, 128)
    r_dedup, _, _ = _dispatch(plane, 3)
    r_nodedup, _, _ = _dispatch(
        plane, 3, bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                              | gpu.GpuBakeFlags.DisableTexCoordDeduplication))
    assert get_stats(r_dedup) == get_stats(r_nodedup)
    assert len(r_nodedup.desc_array) >= len(r_dedup.desc_array)


def test_gpu_subdivision_level_buffer():
    plane = standard_circle(128, 128)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    cfg = gpu.DispatchConfigDesc(
        alpha_texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32),
        index_count=6, max_subdivision_level=4,
        dynamic_subdivision_scale=0.0,
        enable_subdivision_level_buffer=True,
        bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                    | gpu.GpuBakeFlags.DisableSpecialIndices),
        subdivision_levels=np.array([1, 3], np.int8))
    res, _post = gpu.Pipeline().dispatch(cfg, backend="numpy").execute()
    lvls = sorted(d.subdivision_level for d in res.desc_array)
    assert lvls == [1, 3]


def test_gpu_index_formats():
    plane = standard_circle(128, 128)
    res, _, info = _dispatch(plane, 3,
                             bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                                         | gpu.GpuBakeFlags.Allow8BitIndices))
    assert res.index_format == omm.IndexFormat.UINT_8
    assert info.out_omm_index_buffer_format == omm.IndexFormat.UINT_8
    res32, _, _ = _dispatch(plane, 3,
                            bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                                        | gpu.GpuBakeFlags.Force32BitIndices))
    assert res32.index_format == omm.IndexFormat.UINT_32


def test_gpu_batching_plan():
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    tc = np.random.RandomState(0).rand(3000, 2).astype(np.float32)
    ib = np.arange(3000, dtype=np.uint32)
    cfg = gpu.DispatchConfigDesc(
        alpha_texture=tex, tex_coords=tc, index_buffer=ib, index_count=3000,
        max_subdivision_level=9, dynamic_subdivision_scale=0.0,
        max_scratch_memory_size=gpu.ScratchMemoryBudget.MB_4)
    info = gpu.Pipeline().get_pre_dispatch_info(cfg)
    assert info.max_batch_count > 1
    assert info.transient_pool_buffer_sizes[0] <= int(gpu.ScratchMemoryBudget.MB_4) * 2


def test_gpu_setup_before_build_split():
    """PerformSetup then PerformBake (the reference's SetupBeforeBuild
    matrix axis): the split dispatch equals the single-phase bake, the
    bake-only phase is repeatable, and bake-without-setup is rejected."""
    import numpy as np
    import pytest as _pytest
    import omm_tpu as omm
    from omm_tpu import gpu
    from omm_tpu.types import BakeError
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    base = dict(alpha_texture=tex,
                tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]],
                                    np.float32),
                index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32),
                index_count=6, max_subdivision_level=4,
                dynamic_subdivision_scale=0.0)

    pipe = gpu.Pipeline()
    ref, _ = pipe.dispatch(gpu.DispatchConfigDesc(**base),
                           backend="numpy").execute()

    pipe2 = gpu.Pipeline()
    cfg_bake = gpu.DispatchConfigDesc(
        bake_flags=gpu.GpuBakeFlags.PerformBake, **base)
    with _pytest.raises(BakeError):
        pipe2.dispatch(cfg_bake, backend="numpy").execute()

    cfg_setup = gpu.DispatchConfigDesc(
        bake_flags=gpu.GpuBakeFlags.PerformSetup, **base)
    chain_s = pipe2.dispatch(cfg_setup, backend="numpy")
    assert any(p.label == "WorkSetup" for p in chain_s.passes)
    assert not any(p.label == "IndexWrite" for p in chain_s.passes)
    none_result, post_s = chain_s.execute()
    assert none_result is None and post_s.out_omm_desc_size_in_bytes > 0

    chain_b = pipe2.dispatch(cfg_bake, backend="numpy")
    assert not any(p.label == "WorkSetup" for p in chain_b.passes)
    r1, _ = chain_b.execute()
    r2, _ = pipe2.dispatch(cfg_bake, backend="numpy").execute()  # repeat
    for r in (r1, r2):
        assert np.array_equal(r.array_data, ref.array_data)
        assert np.array_equal(r.index_buffer, ref.index_buffer)


def test_gpu_insufficient_scratch_and_nsight_mode():
    """A budget below one primitive's micro-tri scratch is unsplittable ->
    INSUFFICIENT_SCRATCH_MEMORY (bake_gpu_impl.cpp:540-542); Nsight debug
    mode forces one primitive per batch (bake_gpu_impl.cpp:555-559)."""
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    tc = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32)
    ib = np.array([0, 1, 2, 3, 1, 2], np.uint32)

    cfg = gpu.DispatchConfigDesc(
        alpha_texture=tex, tex_coords=tc, index_buffer=ib, index_count=6,
        max_subdivision_level=12, dynamic_subdivision_scale=0.0,
        max_scratch_memory_size=gpu.ScratchMemoryBudget.MB_4)
    with pytest.raises(omm.BakeError) as e:
        gpu.Pipeline().get_pre_dispatch_info(cfg)
    assert e.value.result == omm.Result.INSUFFICIENT_SCRATCH_MEMORY

    cfg2 = gpu.DispatchConfigDesc(
        alpha_texture=tex, tex_coords=tc, index_buffer=ib, index_count=6,
        max_subdivision_level=4, dynamic_subdivision_scale=0.0,
        bake_flags=gpu.GpuBakeFlags.PerformSetupAndBake
        | gpu.GpuBakeFlags.EnableNsightDebugMode)
    info = gpu.Pipeline().get_pre_dispatch_info(cfg2)
    assert info.max_batch_count == 2  # one per primitive


def test_gpu_scratch_budget_enforced_at_execution():
    """A small budget on a bigger mesh must EXECUTE in >1 batch with live
    micro-tri scratch bounded by transient pool 0, and produce results
    identical to the single-batch bake (bake_gpu_impl.cpp:517-584)."""
    plane = standard_circle(128, 128)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    rng = np.random.RandomState(4)
    quads = []
    for _ in range(8):
        b = rng.rand(2).astype(np.float32) * 0.5
        quads += [b, b + [0, 0.4], b + [0.4, 0], b + [0.4, 0.4]]
    tc = np.asarray(quads, np.float32)
    ib = []
    for q in range(8):
        k = 4 * q
        ib += [k, k + 1, k + 2, k + 3, k + 1, k + 2]
    ib = np.asarray(ib, np.uint32)
    base = dict(alpha_texture=tex, tex_coords=tc, index_buffer=ib,
                index_count=len(ib), max_subdivision_level=4,
                dynamic_subdivision_scale=0.0)

    # budget = 4 items' worth of subdiv-4 scratch -> 16 tris / 4 = 4+ batches
    tiny = 4 * omm.get_num_micro_triangles(4) * 8
    pipe_b = gpu.Pipeline()
    res_b, post_b = pipe_b.dispatch(
        gpu.DispatchConfigDesc(max_scratch_memory_size=tiny, **base),
        backend="numpy").execute()
    stats = pipe_b.last_dispatch_stats
    assert stats["batch_count"] > 1
    assert stats["max_live_scratch_bytes"] <= tiny
    assert stats["max_live_scratch_bytes"] <= stats["transient_pool_sizes"][0]

    pipe_1 = gpu.Pipeline()
    res_1, post_1 = pipe_1.dispatch(gpu.DispatchConfigDesc(**base),
                                    backend="numpy").execute()
    assert pipe_1.last_dispatch_stats["batch_count"] == 1
    assert np.array_equal(res_b.array_data, res_1.array_data)
    assert np.array_equal(res_b.index_buffer, res_1.index_buffer)
    assert post_b == post_1

    # the dispatch chain advertises the per-batch passes
    chain = gpu.Pipeline().dispatch(
        gpu.DispatchConfigDesc(max_scratch_memory_size=tiny, **base),
        backend="numpy")
    assert any(p.label.startswith("Batch 1 ") for p in chain.passes)
    classify = [p for p in chain.passes if p.kind == "classify"]
    assert all("resources" in p.detail for p in classify)


def test_gpu_nsight_mode_executes_one_primitive_per_batch():
    """EnableNsightDebugMode: executed batch count equals the primitive
    count, results unchanged (bake_gpu_impl.cpp:555-559)."""
    plane = standard_circle(64, 64)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    base = dict(alpha_texture=tex,
                tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]],
                                    np.float32),
                index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32),
                index_count=6, max_subdivision_level=3,
                dynamic_subdivision_scale=0.0)
    pipe = gpu.Pipeline()
    res_n, _ = pipe.dispatch(
        gpu.DispatchConfigDesc(
            bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                        | gpu.GpuBakeFlags.EnableNsightDebugMode), **base),
        backend="numpy").execute()
    assert pipe.last_dispatch_stats["batch_count"] == 2  # one per primitive
    res, _ = gpu.Pipeline().dispatch(gpu.DispatchConfigDesc(**base),
                                     backend="numpy").execute()
    assert np.array_equal(res_n.array_data, res.array_data)
    assert np.array_equal(res_n.index_buffer, res.index_buffer)


def test_gpu_transient_pools_shape_and_monotonicity():
    """<=4 bump-allocated transient pools (bake_gpu_impl.cpp:434-516);
    every pool grows monotonically with the mesh size."""
    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)

    def pools(n_tris):
        tc = np.random.RandomState(1).rand(3 * n_tris, 2).astype(np.float32)
        ib = np.arange(3 * n_tris, dtype=np.uint32)
        cfg = gpu.DispatchConfigDesc(
            alpha_texture=tex, tex_coords=tc, index_buffer=ib,
            index_count=3 * n_tris, max_subdivision_level=6,
            dynamic_subdivision_scale=0.0)
        return gpu.Pipeline().get_pre_dispatch_info(
            cfg).transient_pool_buffer_sizes

    small, big = pools(10), pools(1000)
    assert 1 <= len(small) <= 4 and len(small) == len(big)
    for a, b in zip(small, big):
        assert a <= b


def test_gpu_dispatch_jax_backend_parity():
    """The dispatch chain's jax execution engine equals the numpy one."""
    rng = np.random.RandomState(0)
    alpha = (rng.rand(64, 64) > 0.5).astype(np.float32)
    tex = omm.Texture([alpha], omm.TextureFormat.FP32)
    cfg = gpu.DispatchConfigDesc(
        alpha_texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
        max_subdivision_level=4, dynamic_subdivision_scale=0.0)
    ra, pa = gpu.Pipeline().dispatch(cfg, backend="numpy").execute()
    rb, pb = gpu.Pipeline().dispatch(cfg, backend="jax").execute()
    assert np.array_equal(ra.array_data, rb.array_data)
    assert np.array_equal(ra.index_buffer, rb.index_buffer)
    assert pa == pb


# ---------------------------------------------------------------------------
# Fixture matrix: the analog of the reference GPU suite's 40-combination
# instantiation (test_omm_bake_gpu.cpp:1527-1572) — param axes
# {mode, special indices, post-dispatch stats, 32-bit output indices,
# texcoord dedup, 16-bit input indices, stats+compute} x RGBA channel.
# Histograms are recomputed from desc/index buffers per bake
# (util/omm_histogram.cpp:20-122) and per-state totals must be invariant
# across packaging flags.
# ---------------------------------------------------------------------------

_CHANNEL_FIXTURES = {  # R, G, B, A planes of the synthetic RGBA asset
    0: standard_circle, 1: sine_fp32, 2: mandelbrot, 3: hexagons}

_MATRIX_VARIANTS = (
    "default", "compute_only", "setup_before_build", "no_special",
    "post_stats", "force32", "no_dedup", "uint16_indices",
    "no_special_force32", "stats_compute_only", "no_level_line")


@pytest.mark.parametrize("channel", sorted(_CHANNEL_FIXTURES))
@pytest.mark.parametrize("variant", _MATRIX_VARIANTS)
def test_gpu_fixture_matrix(channel, variant):
    # ONE genuine RGBA texture; the channel axis drives alphaTextureChannel
    # like the reference's per-channel Gather PSOs
    # (bake_gpu_impl.cpp:313-419).
    rgba = np.stack([_CHANNEL_FIXTURES[c](128, 128)
                     for c in sorted(_CHANNEL_FIXTURES)], axis=-1)
    tex = omm.Texture([rgba], omm.TextureFormat.FP32)
    tc = np.array([[0.07, 0.03], [0.06, 0.92], [0.96, 0.04], [0.9, 0.9]],
                  np.float32)
    ib = np.array([0, 1, 2, 3, 1, 2], np.uint32)
    flags = gpu.GpuBakeFlags.PerformSetupAndBake
    if variant == "compute_only":
        flags |= gpu.GpuBakeFlags.ComputeOnly
    elif variant == "no_special":
        flags |= gpu.GpuBakeFlags.DisableSpecialIndices
    elif variant == "post_stats":
        flags |= gpu.GpuBakeFlags.EnablePostDispatchInfoStats
    elif variant == "force32":
        flags |= gpu.GpuBakeFlags.Force32BitIndices
    elif variant == "no_dedup":
        flags |= gpu.GpuBakeFlags.DisableTexCoordDeduplication
    elif variant == "uint16_indices":
        ib = ib.astype(np.uint16)
    elif variant == "no_special_force32":
        flags |= (gpu.GpuBakeFlags.DisableSpecialIndices
                  | gpu.GpuBakeFlags.Force32BitIndices)
    elif variant == "stats_compute_only":
        flags |= (gpu.GpuBakeFlags.EnablePostDispatchInfoStats
                  | gpu.GpuBakeFlags.ComputeOnly)
    elif variant == "no_level_line":
        flags |= gpu.GpuBakeFlags.DisableLevelLineIntersection

    base = dict(alpha_texture=tex, alpha_texture_channel=channel,
                tex_coords=tc, index_buffer=ib, index_count=6,
                max_subdivision_level=3, dynamic_subdivision_scale=0.0)

    pipe = gpu.Pipeline()
    if variant == "setup_before_build":
        cfg_s = gpu.DispatchConfigDesc(
            bake_flags=gpu.GpuBakeFlags.PerformSetup, **base)
        none_res, _ = pipe.dispatch(cfg_s, backend="numpy").execute()
        assert none_res is None
        cfg_b = gpu.DispatchConfigDesc(
            bake_flags=gpu.GpuBakeFlags.PerformBake, **base)
        res, post = pipe.dispatch(cfg_b, backend="numpy").execute()
    else:
        cfg = gpu.DispatchConfigDesc(bake_flags=flags, **base)
        res, post = pipe.dispatch(cfg, backend="numpy").execute()

    # histogram self-consistency (util/omm_histogram.cpp:20-122)
    validate_histograms(res)
    s = get_stats(res)
    assert (s.total_opaque + s.total_transparent + s.total_unknown_opaque
            + s.total_unknown_transparent) == 2 * 4 ** 3

    if variant == "no_level_line":
        # Not a packaging variant: DisableLevelLineIntersection changes the
        # classification kernel (conservative bilinear min/max over the
        # rasterized TRIANGLE footprint, omm_resample_common.hlsli:355-372,
        # gated at bake_gpu_impl.cpp:714).  Parity oracle: the engine's
        # fine pass under the same config.
        from omm_tpu import engine as _engine
        rcfg = _engine.ResampleConfig(
            addr_mode=omm.TextureAddressMode.Clamp,
            filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
            border_alpha=0.0, fmt=omm.Format.OC1_4_State,
            promotion=omm.UnknownStatePromotion.ForceOpaque,
            cutoff_gt=omm.OpacityState.Opaque,
            cutoff_le=omm.OpacityState.Transparent,
            disable_level_line=True, enable_aabb_testing=False)
        M = omm.get_num_micro_triangles(3)
        UO = int(omm.OpacityState.UnknownOpaque)
        want = np.zeros(4, np.int64)
        for k in range(2):
            tri = tc[ib[3 * k:3 * k + 3]]
            st = _engine.resample_fine_item(tex.channel_view(channel), rcfg,
                                            tri, 3, np.full(M, UO, np.uint8))
            want += np.bincount(st, minlength=4)[:4]
        assert (s.total_transparent, s.total_opaque,
                s.total_unknown_transparent, s.total_unknown_opaque) \
            == tuple(want)
        return

    # per-state totals are a packaging invariant: every variant matches
    # the default bake of the same channel
    ref, _ = gpu.Pipeline().dispatch(
        gpu.DispatchConfigDesc(**base), backend="numpy").execute()
    rs = get_stats(ref)
    assert (s.total_opaque, s.total_transparent, s.total_unknown_opaque,
            s.total_unknown_transparent) == (
        rs.total_opaque, rs.total_transparent, rs.total_unknown_opaque,
        rs.total_unknown_transparent)

    # variant-specific contracts
    if variant in ("force32", "no_special_force32"):
        assert res.index_format == omm.IndexFormat.UINT_32
    if variant in ("no_special", "no_special_force32"):
        assert (np.asarray(res.index_buffer) >= 0).all()
    if variant in ("post_stats", "stats_compute_only"):
        assert post.out_stats_total_opaque_count == s.total_opaque
        assert post.out_stats_total_transparent_count == s.total_transparent
    if variant == "no_dedup":
        assert len(res.desc_array) >= len(ref.desc_array)
    if variant == "uint16_indices":
        assert np.array_equal(res.array_data, ref.array_data)
    if variant == "setup_before_build":
        assert np.array_equal(res.array_data, ref.array_data)
        assert np.array_equal(res.index_buffer, ref.index_buffer)


@pytest.mark.parametrize("channel", sorted(_CHANNEL_FIXTURES))
def test_gpu_rgba_channel_bitmatch(channel):
    """An RGBA bake with alphaTextureChannel=c is BYTE-identical to baking
    the pre-extracted channel-c plane (GatherRed/Green/Blue/Alpha,
    omm_resample_common.hlsli:201-209)."""
    rgba = np.stack([_CHANNEL_FIXTURES[c](128, 128)
                     for c in sorted(_CHANNEL_FIXTURES)], axis=-1)
    tc = np.array([[0.07, 0.03], [0.06, 0.92], [0.96, 0.04], [0.9, 0.9]],
                  np.float32)
    ib = np.array([0, 1, 2, 3, 1, 2], np.uint32)

    def bake_with(tex, ch):
        cfg = gpu.DispatchConfigDesc(
            alpha_texture=tex, alpha_texture_channel=ch, tex_coords=tc,
            index_buffer=ib, index_count=6, max_subdivision_level=4,
            dynamic_subdivision_scale=0.0)
        return gpu.Pipeline().dispatch(cfg, backend="numpy").execute()[0]

    got = bake_with(omm.Texture([rgba], omm.TextureFormat.FP32), channel)
    want = bake_with(
        omm.Texture([rgba[..., channel]], omm.TextureFormat.FP32), channel)
    assert np.array_equal(got.array_data, want.array_data)
    assert np.array_equal(got.index_buffer, want.index_buffer)
    assert [(d.offset, d.subdivision_level, d.format)
            for d in got.desc_array] == \
        [(d.offset, d.subdivision_level, d.format) for d in want.desc_array]


def test_gpu_rgba_channel_out_of_range():
    rgba = np.zeros((32, 32, 4), np.float32)
    tex = omm.Texture([rgba], omm.TextureFormat.FP32)
    cfg = gpu.DispatchConfigDesc(
        alpha_texture=tex, alpha_texture_channel=4,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0]], np.float32),
        index_buffer=np.arange(3, dtype=np.uint32), index_count=3,
        max_subdivision_level=2, dynamic_subdivision_scale=0.0)
    with pytest.raises(omm.BakeError) as ei:
        gpu.Pipeline().dispatch(cfg, backend="numpy")
    assert ei.value.result == omm.Result.INVALID_ARGUMENT


def test_cpu_bake_rejects_multichannel_texture():
    rgba = np.zeros((32, 32, 4), np.float32)
    tex = omm.Texture([rgba], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0]], np.float32),
        index_buffer=np.arange(3, dtype=np.uint32), index_count=3,
        max_subdivision_level=2)
    with pytest.raises(omm.BakeError) as ei:
        omm.bake(desc)
    assert ei.value.result == omm.Result.INVALID_ARGUMENT


def test_gpu_disable_level_line_is_triangle_footprint():
    """DisableLevelLineIntersection must select the conservative-bilinear
    test over the rasterized TRIANGLE footprint (two_tris=False), NOT the
    CPU baker's AABB-split debug mode (omm_resample_common.hlsli:355-372;
    gate at bake_gpu_impl.cpp:714).  Regression: the flag used to route to
    enable_aabb_testing=True."""
    from omm_tpu import engine as _engine

    plane = standard_circle(128, 128)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    tc = np.array([[0.07, 0.03], [0.06, 0.92], [0.96, 0.04]], np.float32)
    ib = np.arange(3, dtype=np.uint32)
    cfg = gpu.DispatchConfigDesc(
        alpha_texture=tex, tex_coords=tc, index_buffer=ib, index_count=3,
        max_subdivision_level=4, dynamic_subdivision_scale=0.0,
        bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                    | gpu.GpuBakeFlags.DisableLevelLineIntersection
                    | gpu.GpuBakeFlags.DisableSpecialIndices))
    res, _ = gpu.Pipeline().dispatch(cfg, backend="numpy").execute()
    s = get_stats(res)

    M = omm.get_num_micro_triangles(4)
    UO = int(omm.OpacityState.UnknownOpaque)
    base = dict(addr_mode=omm.TextureAddressMode.Clamp,
                filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
                border_alpha=0.0, fmt=omm.Format.OC1_4_State,
                promotion=omm.UnknownStatePromotion.ForceOpaque,
                cutoff_gt=omm.OpacityState.Opaque,
                cutoff_le=omm.OpacityState.Transparent,
                disable_level_line=True)
    tri_cfg = _engine.ResampleConfig(**base, enable_aabb_testing=False)
    aabb_cfg = _engine.ResampleConfig(**base, enable_aabb_testing=True)
    st_tri = _engine.resample_fine_item(tex, tri_cfg, tc, 4,
                                        np.full(M, UO, np.uint8))
    st_aabb = _engine.resample_fine_item(tex, aabb_cfg, tc, 4,
                                         np.full(M, UO, np.uint8))
    # the two internal modes genuinely differ on this workload...
    assert not np.array_equal(st_tri, st_aabb)
    # ...and the GPU flag picks the triangle-footprint one
    cnt = np.bincount(st_tri, minlength=4)
    assert (s.total_transparent, s.total_opaque, s.total_unknown_transparent,
            s.total_unknown_opaque) == tuple(cnt[:4])


# --- dispatch-chain consumer: RecordingRHI (omm-gpu-nvrhi analog) ---

def _quad_cfg(n_quads=8, subdiv=4, **kw):
    plane = standard_circle(128, 128)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    rng = np.random.RandomState(4)
    quads = []
    for _ in range(n_quads):
        b = rng.rand(2).astype(np.float32) * 0.5
        quads += [b, b + [0, 0.4], b + [0.4, 0], b + [0.4, 0.4]]
    ib = []
    for q in range(n_quads):
        k = 4 * q
        ib += [k, k + 1, k + 2, k + 3, k + 1, k + 2]
    return gpu.DispatchConfigDesc(
        alpha_texture=tex, tex_coords=np.asarray(quads, np.float32),
        index_buffer=np.asarray(ib, np.uint32), index_count=len(ib),
        max_subdivision_level=subdiv, dynamic_subdivision_scale=0.0, **kw)


def test_rhi_records_and_validates_chain():
    """The command stream a client backend receives: labels for every
    pass, in-bounds binds, dispatch count parity (omm-gpu-nvrhi.cpp
    command translation, validated like the nvrhi validation layer)."""
    cfg = _quad_cfg()
    pipe = gpu.Pipeline()
    info = pipe.get_pre_dispatch_info(cfg)
    chain = pipe.dispatch(cfg, backend="numpy")
    rec = gpu.RecordingRHI(info.transient_pool_buffer_sizes)
    gpu.record_chain(chain, rec)
    assert rec.labels == [p.label for p in chain.passes]
    assert rec.dispatch_count == len(chain.passes)
    # every pool's high-water mark stays within its size
    for hw, size in zip(rec.high_water, info.transient_pool_buffer_sizes):
        assert hw <= size
    # classify passes carry concrete bake-result sub-ranges of pool 0
    classify = [p for p in chain.passes if p.kind == "classify"]
    assert classify
    for p in classify:
        rr = [r for r in p.detail["resources"] if r.pool == 0]
        assert len(rr) == 1 and rr[0].usage == "bake_result"
        assert rr[0].size == (p.detail["count"]
                              * omm.get_num_micro_triangles(
                                  p.detail["level"]) * 8)


def test_rhi_pool0_bump_resets_per_batch():
    """Multi-batch chains reuse pool 0 from offset 0 each batch (the
    reference's per-batch transient scratch reuse,
    bake_gpu_impl.cpp:517-584) and place barriers between passes sharing
    a pool."""
    tiny = 4 * omm.get_num_micro_triangles(4) * 8
    cfg = _quad_cfg(max_scratch_memory_size=tiny)
    pipe = gpu.Pipeline()
    info = pipe.get_pre_dispatch_info(cfg)
    chain = pipe.dispatch(cfg, backend="numpy")
    batches = {}
    for p in chain.passes:
        if p.kind != "classify":
            continue
        rr0 = [r for r in p.detail["resources"] if r.pool == 0][0]
        batches.setdefault(p.detail["batch"], []).append(rr0)
    assert len(batches) > 1
    for b, rrs in batches.items():
        assert rrs[0].offset == 0          # bump reset at batch start
        for a, c in zip(rrs, rrs[1:]):
            assert c.offset == a.end       # bump-allocated, contiguous
        assert rrs[-1].end <= info.transient_pool_buffer_sizes[0]
    rec = gpu.RecordingRHI(info.transient_pool_buffer_sizes)
    gpu.record_chain(chain, rec)
    assert any(c[0] == "barrier" for c in rec.commands)


def test_rhi_validation_rejects_bad_plans():
    import pytest as _pytest
    rec = gpu.RecordingRHI((64, 64))
    with _pytest.raises(ValueError, match="out of bounds"):
        rec.bind([gpu.ResourceRange(0, 32, 64, "x")])
    with _pytest.raises(ValueError, match="overlap"):
        rec.bind([gpu.ResourceRange(0, 0, 32, "a"),
                  gpu.ResourceRange(0, 16, 32, "b")])
    # read-read overlap is legal
    rec.bind([gpu.ResourceRange(0, 0, 32, "a", "r"),
              gpu.ResourceRange(0, 16, 32, "b", "r")])
    rec.begin_label("open")
    with _pytest.raises(ValueError, match="unclosed"):
        rec.finish()
    with _pytest.raises(ValueError, match="without begin"):
        rec2 = gpu.RecordingRHI((8,))
        rec2.end_label()


def test_compute_only_engine_selection_and_parity():
    """GpuBakeFlags.ComputeOnly selects the dense all-micro-tri XLA
    engine (no Pallas rasterizer — the reference's compute-shader
    fallback role, bake_gpu_impl.cpp ComputeOnly pass selection); the
    default path uses the two-phase pipeline.  Both must produce
    identical results."""
    cfg_kw = dict()
    res_hw, _, _ = _dispatch(standard_circle(256, 256), 4,
                             backend_override="jax", **cfg_kw)
    res_co, _, _ = _dispatch(
        standard_circle(256, 256), 4, backend_override="jax",
        bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                    | gpu.GpuBakeFlags.ComputeOnly), **cfg_kw)
    assert np.array_equal(res_hw.array_data, res_co.array_data)
    assert np.array_equal(np.asarray(res_hw.index_buffer),
                          np.asarray(res_co.index_buffer))


def test_compute_only_never_touches_pallas(monkeypatch):
    """The ComputeOnly engine must run without the Pallas kernel (the
    'no custom rasterizer' contract)."""
    from omm_tpu.kernels import pallas_classify as pk

    def boom(*a, **k):
        raise AssertionError("Pallas kernel invoked on the ComputeOnly "
                             "engine")

    monkeypatch.setattr(pk, "_run_v3", boom)
    res, _, _ = _dispatch(
        standard_circle(128, 128), 3, backend_override="jax",
        bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                    | gpu.GpuBakeFlags.ComputeOnly))
    s = get_stats(res)
    assert s.total_opaque + s.total_transparent \
        + s.total_unknown_opaque + s.total_unknown_transparent \
        == 2 * 4 ** 3
