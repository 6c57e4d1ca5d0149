"""Wide randomized differential net over the FULL bake descriptor space.

The reference's correctness story is a 6.6k-LoC matrix that re-instantiates
its whole bake suite under 6 global configs (test_omm_bake_cpu.cpp:32-40,
2581).  Building the reference binary as a live oracle is infeasible here
(its vendored externals are stripped), so this seeded corpus is the
substitute: every case bakes the SAME randomized descriptor through the
numpy oracle and a device backend and asserts FULL BakeResult byte
equality — array data, desc array, both histograms, index buffer + format,
and the serialized result blob.

Coverage axes (all randomized per case):
  texture   size (incl. non-pow2) x mip count x FP32/UNORM8 x RGBA channel
            selection x embedded alpha-cutoff (SAT coarse pass) x
            DisableZOrder
  sampler   5 address modes x 2 filters x border alpha
  geometry  in-range / multi-repeat wrap / degenerate (point+line) /
            exact-duplicate / near-duplicate clusters / shared vertices,
            CW and CCW
  formats   OC1_2/4-state global + per-triangle `formats` arrays,
            cutoff-state remaps (4-state only), all 3 promotion modes
  levels    max_subdivision_level up to 9, per-triangle
            `subdivision_levels` (incl. 0xFF = use-global), dynamic
            subdivision scale (area + edge heuristics)
  texcoords UV32_FLOAT / UV16_FLOAT / UV16_UNORM, custom strides,
            16/32-bit index buffers
  pipeline  rejection_threshold, max_array_data_size compression,
            exact dedup on/off, near-duplicate LSH + brute force,
            DisableSpecialIndices / Force32BitIndices / Allow8BitIndices /
            DisableLevelLineIntersection / DisableFineClassification /
            EnableEdgeHeuristic / internal threads
  routes    numpy vs jax backend (bulk), vs pallas interpret (production
            two-phase engine), vs the GPU-baker Pipeline.dispatch chain,
            vs the mesh= sharded route (8 virtual devices), plus
            workload-cancel error parity
"""
import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import gpu
from omm_tpu.types import BakeFlags


@pytest.fixture(autouse=True)
def _bound_backend_accumulation():
    """Drop jit caches after every fuzz case.  This suite compiles far
    more DISTINCT large CPU programs than any other module, and
    jax 0.9.0's XLA:CPU backend segfaults (inside
    backend_compile_and_load, with or without the persistent cache)
    once enough big executables accumulate in one process — observed
    deterministically at ~13 fuzz cases on this round's host, while
    every case passes in isolation.  Clearing per case bounds the
    accumulation (fuzz-only run: 48 passed / 0 crashes); the
    persistent disk cache keeps the re-load cost of shared signatures
    small."""
    yield
    import jax

    jax.clear_caches()

# total micro-triangle budget per case: keeps the 200+ case corpus inside
# a CI-friendly wall time on the 1-CPU host while still reaching subdiv 9
UTRI_BUDGET = 300_000

# fixed palettes bound the number of distinct jit signatures the jax
# backend compiles (sizes/levels outside these appear via big_case)
TEX_SIZES = ((32, 32), (64, 64), (64, 32), (48, 48), (128, 128))


def _mip_chain(rng, h, w, nmips):
    base = rng.rand(h, w).astype(np.float32)
    kind = rng.randint(4)
    if kind == 1:     # binary
        base = (base > np.float32(0.5)).astype(np.float32)
    elif kind == 2:   # smooth radial edge
        j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                           np.arange(w, dtype=np.float32), indexing="ij")
        r = np.hypot(i / w - 0.5, j / h - 0.5)
        base = np.clip((np.float32(0.4) - r) / np.float32(0.15),
                       0.0, 1.0).astype(np.float32)
    elif kind == 3:   # near-cutoff band (hard case for window shortcuts)
        base = (np.float32(0.5) + (base - np.float32(0.5))
                * np.float32(1e-3)).astype(np.float32)
    mips = [base]
    for _ in range(nmips - 1):
        m = mips[-1][::2, ::2]
        if min(m.shape) < 2:
            break
        mips.append(m.copy())
    return mips


def _texture(rng):
    h, w = TEX_SIZES[rng.randint(len(TEX_SIZES))]
    nmips = 1 + rng.randint(3)
    mips = _mip_chain(rng, h, w, nmips)
    unorm8 = bool(rng.randint(2))
    if unorm8:
        mips = [np.round(m * np.float32(255)).astype(np.uint8)
                for m in mips]
    fmt = omm.TextureFormat.UNORM8 if unorm8 else omm.TextureFormat.FP32
    flags = (omm.TextureFlags.DisableZOrder if rng.randint(2)
             else omm.TextureFlags.NONE)
    cutoff = 0.5
    embed = bool(rng.randint(4) == 0)  # embedded cutoff -> SAT coarse pass
    if rng.randint(3) == 0:            # RGBA plane, channel-selected
        chan = int(rng.randint(4))
        rgba = [np.stack([m if c == chan else
                          (rng.rand(*m.shape) * (255 if unorm8 else 1))
                          .astype(m.dtype) for c in range(4)], axis=-1)
                for m in mips]
        tex = omm.Texture(rgba, fmt, flags,
                          alpha_cutoff=cutoff if embed else -1.0)
        return tex.channel_view(chan), cutoff
    tex = omm.Texture(mips, fmt, flags,
                      alpha_cutoff=cutoff if embed else -1.0)
    return tex, cutoff


def _geometry(rng):
    """Returns (tex_coords (V,2) fp32, index list) mixing the hard
    geometry classes."""
    tri_count = 1 + rng.randint(8)
    uvs, idx = [], []

    def add(tri):
        b = len(uvs)
        uvs.extend(np.asarray(tri, np.float32))
        idx.extend([b, b + 1, b + 2])

    for _ in range(tri_count):
        kind = rng.randint(8)
        b = rng.rand(2).astype(np.float32)
        t = np.stack([b + rng.rand(2).astype(np.float32) * 0.5
                      for _ in range(3)])
        if kind == 0:    # multi-repeat (wrap/mirror territory)
            t = t * np.float32(1 + rng.randint(3)) \
                - rng.rand(2).astype(np.float32) * 2
        elif kind == 1:  # degenerate line
            d = rng.rand(2).astype(np.float32)
            t = np.stack([b, b + d, b + 2 * d])
        elif kind == 2:  # degenerate point
            t = np.stack([b, b, b])
        elif kind == 3 and idx:  # exact duplicate of an earlier triangle
            idx.extend(idx[-3:])
            continue
        elif kind == 4 and idx:  # near duplicate (LSH/brute-force fodder)
            first = np.asarray(uvs[idx[-3]:idx[-3] + 3], np.float32)
            t = first + (rng.rand(3, 2).astype(np.float32)
                         - np.float32(0.5)) * np.float32(2e-3)
        elif kind == 5:  # CW winding
            t = t[::-1].copy()
        add(t)
    return np.asarray(uvs, np.float32), idx


def _pack_uv16(uv32, unorm):
    """Reference ConvertTexCoords (test_omm_bake_cpu.cpp:116-134)."""
    if unorm:
        q = np.floor(np.clip(uv32, np.float32(0.0), np.float32(1.0))
                     * np.float32(65535.0)
                     + np.float32(0.5)).astype(np.uint32)
    else:
        q = uv32.astype(np.float16).view(np.uint16).astype(np.uint32)
    return (q[:, 0] | (q[:, 1] << 16)).astype(np.uint32).view(np.uint8)


def _random_desc(rng):
    tex, cutoff = _texture(rng)
    tc, idx = _geometry(rng)
    tri_count = len(idx) // 3

    # --- levels (bounded by the per-case micro-tri budget) ---
    max_level = int(rng.randint(1, 10))  # up to subdiv 9
    while tri_count * 4 ** max_level > UTRI_BUDGET and max_level > 1:
        max_level -= 1
    sub_levels = None
    if rng.randint(3) == 0:
        sub_levels = rng.randint(0, max_level + 1,
                                 size=tri_count).astype(np.uint8)
        sub_levels[rng.rand(tri_count) < 0.25] = 0xFF  # use-global marker
    dyn = [0.0, 0.0, 2.0, 0.5][rng.randint(4)]

    # --- formats / cutoff states ---
    fmt = omm.Format.OC1_2_State if rng.randint(3) == 0 \
        else omm.Format.OC1_4_State
    formats = None
    if rng.randint(4) == 0:
        formats = np.where(rng.rand(tri_count) < 0.5,
                           int(omm.Format.OC1_2_State),
                           int(omm.Format.OC1_4_State)).astype(np.uint16)
    le, gt = omm.OpacityState.Transparent, omm.OpacityState.Opaque
    any2 = fmt == omm.Format.OC1_2_State or (
        formats is not None
        and (formats == int(omm.Format.OC1_2_State)).any())
    if not any2 and rng.randint(4) == 0:  # 4-state-only cutoff remap
        states = [omm.OpacityState.Transparent, omm.OpacityState.Opaque,
                  omm.OpacityState.UnknownTransparent,
                  omm.OpacityState.UnknownOpaque]
        le = states[rng.randint(4)]
        gt = states[rng.randint(4)]

    # --- flags ---
    flags = BakeFlags.NONE
    for f in (BakeFlags.DisableSpecialIndices, BakeFlags.Force32BitIndices,
              BakeFlags.Allow8BitIndices, BakeFlags.EnableInternalThreads,
              BakeFlags.EnableEdgeHeuristic):
        if rng.randint(5) == 0:
            flags |= f
    r = rng.randint(8)
    if r == 0:
        flags |= BakeFlags.DisableDuplicateDetection
    elif r == 1:
        flags |= BakeFlags.EnableNearDuplicateDetection
    elif r == 2:
        flags |= BakeFlags.EnableNearDuplicateDetectionBruteForce
    if rng.randint(10) == 0:
        flags |= BakeFlags.DisableLevelLineIntersection
    if rng.randint(12) == 0:
        flags |= BakeFlags.DisableFineClassification

    # --- texcoord packing / strides / index width ---
    tcf = [omm.TexCoordFormat.UV32_FLOAT] * 3 \
        + [omm.TexCoordFormat.UV16_FLOAT, omm.TexCoordFormat.UV16_UNORM]
    tcf = tcf[rng.randint(len(tcf))]
    stride = 0
    if tcf == omm.TexCoordFormat.UV32_FLOAT:
        coords = tc
        if rng.randint(4) == 0:  # padded stride through the byte path
            stride = 12
            raw = np.zeros((len(tc), 12), np.uint8)
            raw[:, :8] = tc.view(np.uint8).reshape(len(tc), 8)
            coords = raw.reshape(-1)
    else:
        coords = _pack_uv16(np.clip(tc, 0.0, 1.0)
                            if tcf == omm.TexCoordFormat.UV16_UNORM else tc,
                            unorm=tcf == omm.TexCoordFormat.UV16_UNORM)
    if rng.randint(3) == 0:
        idx_fmt, idx_arr = omm.IndexFormat.UINT_16, \
            np.asarray(idx, np.uint16)
    else:
        idx_fmt, idx_arr = omm.IndexFormat.UINT_32, \
            np.asarray(idx, np.uint32)

    return omm.BakeInputDesc(
        texture=tex, bake_flags=flags,
        runtime_sampler=omm.SamplerDesc(
            addressing_mode=omm.TextureAddressMode(rng.randint(5)),
            filter=omm.TextureFilterMode(rng.randint(2)),
            border_alpha=float(rng.rand())),
        tex_coord_format=tcf, tex_coords=coords,
        tex_coord_stride_in_bytes=stride,
        index_format=idx_fmt, index_buffer=idx_arr,
        index_count=len(idx),
        dynamic_subdivision_scale=dyn,
        rejection_threshold=float(rng.rand()) if rng.randint(4) == 0
        else 0.0,
        alpha_cutoff=cutoff,
        near_duplicate_deduplication_factor=float(rng.uniform(0.05, 0.3)),
        alpha_cutoff_less_equal=le, alpha_cutoff_greater=gt,
        format=fmt, formats=formats,
        unknown_state_promotion=omm.UnknownStatePromotion(rng.randint(3)),
        max_subdivision_level=max_level,
        max_array_data_size=(int(rng.randint(16, 512))
                             if rng.randint(5) == 0 else 0xFFFFFFFF),
        subdivision_levels=sub_levels)


def _ctx(desc):
    return dict(addr=desc.runtime_sampler.addressing_mode.name,
                filt=desc.runtime_sampler.filter.name,
                fmt=desc.format.name, flags=int(desc.bake_flags),
                tcf=desc.tex_coord_format.name,
                max_level=desc.max_subdivision_level,
                per_tri_levels=desc.subdivision_levels is not None,
                per_tri_formats=desc.formats is not None,
                dyn=desc.dynamic_subdivision_scale,
                rej=desc.rejection_threshold,
                cap=desc.max_array_data_size,
                tris=desc.index_count // 3,
                tex=(desc.texture.format.name, desc.texture.size(0),
                     desc.texture.mip_count))


def _assert_equal(a, b, ctx):
    assert a.index_format == b.index_format, ctx
    assert np.array_equal(a.array_data, b.array_data), ctx
    assert a.desc_array == b.desc_array, ctx
    assert a.desc_array_histogram == b.desc_array_histogram, ctx
    assert a.index_histogram == b.index_histogram, ctx
    assert np.array_equal(np.asarray(a.index_buffer),
                          np.asarray(b.index_buffer)), ctx
    # serialized result blobs must agree byte-for-byte too
    from omm_tpu.baker import Baker
    bk = Baker()
    assert bk.serialize(result_descs=[a]) == bk.serialize(
        result_descs=[b]), ctx


# ---------------------------------------------------------------------------
# Route 1 (bulk): numpy oracle vs the jax backend — 168 cases
# ---------------------------------------------------------------------------

def _bake_or_error(desc, **kw):
    """bake() outcome as a comparable value: the BakeResult, or the
    Result code when bake legitimately fails.  The corpus can generate
    descriptors the REFERENCE itself rejects — e.g. per-triangle mixed
    formats overflow its serialize pass, whose array size counts only
    the global format's histogram row while the write loop walks every
    non-special item (bake_cpu_impl.cpp:1766-1797 sizes by desc.format;
    :1795 returns ommResult_FAILURE on overflow) — so the differential
    contract is that every backend agrees on the outcome, including
    agreeing to fail with the same Result code."""
    try:
        return omm.bake(desc, **kw)
    except omm.BakeError as e:
        return e.result


def _assert_same_outcome(a, b, ctx):
    if isinstance(a, omm.Result) or isinstance(b, omm.Result):
        assert a == b, (a, b, ctx)
        return
    _assert_equal(a, b, ctx)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(28))
def test_fuzz_numpy_vs_jax(seed):
    rng = np.random.RandomState(31000 + seed)
    for trial in range(6):
        desc = _random_desc(rng)
        a = _bake_or_error(desc, backend="numpy")
        b = _bake_or_error(desc, backend="jax")
        _assert_same_outcome(a, b, (seed, trial, _ctx(desc)))


# ---------------------------------------------------------------------------
# Route 2: numpy vs the production two-phase pallas engine (interpret) —
# 24 cases
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_fuzz_numpy_vs_pallas(seed, monkeypatch):
    import jax.experimental.pallas as plmod
    import omm_tpu.kernels.pallas_classify as pk

    orig = plmod.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pk.pl, "pallas_call", interp)

    rng = np.random.RandomState(64000 + seed)
    for trial in range(4):
        desc = _random_desc(rng)
        a = _bake_or_error(desc, backend="numpy")
        b = _bake_or_error(desc, backend="pallas")
        _assert_same_outcome(a, b, (seed, trial, _ctx(desc)))


# ---------------------------------------------------------------------------
# Route 3: the GPU-baker dispatch chain, numpy vs jax execution — 16 cases
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_fuzz_gpu_dispatch(seed):
    rng = np.random.RandomState(99000 + seed)
    for trial in range(2):
        tex, cutoff = _texture(rng)
        tc, idx = _geometry(rng)
        tri_count = len(idx) // 3
        max_level = int(rng.randint(1, 8))
        while tri_count * 4 ** max_level > UTRI_BUDGET and max_level > 1:
            max_level -= 1
        sub_levels = None
        if rng.randint(2) == 0:
            sub_levels = rng.randint(
                0, max_level + 1, size=tri_count).astype(np.uint8)
        # engine axis: half the cases route the jax leg through the
        # ComputeOnly engine (full pipeline, XLA exact stage) — the
        # numpy leg is engine-blind, so equality pins BOTH engines to
        # the oracle across the whole descriptor space
        compute_only = rng.randint(2) == 0
        cfg = gpu.DispatchConfigDesc(
            alpha_texture=tex,
            runtime_sampler=omm.SamplerDesc(
                addressing_mode=omm.TextureAddressMode(rng.randint(5)),
                filter=omm.TextureFilterMode(rng.randint(2)),
                border_alpha=float(rng.rand())),
            bake_flags=(gpu.GpuBakeFlags.PerformSetupAndBake
                        | (gpu.GpuBakeFlags.ComputeOnly if compute_only
                           else gpu.GpuBakeFlags(0))),
            tex_coords=tc, index_buffer=np.asarray(idx, np.uint32),
            index_count=len(idx), alpha_cutoff=cutoff,
            dynamic_subdivision_scale=[0.0, 2.0][rng.randint(2)],
            global_format=omm.Format.OC1_2_State if rng.randint(3) == 0
            else omm.Format.OC1_4_State,
            max_subdivision_level=max_level,
            enable_subdivision_level_buffer=sub_levels is not None,
            subdivision_levels=sub_levels,
            unknown_state_promotion=omm.UnknownStatePromotion(
                rng.randint(3)))
        ra, pa = gpu.Pipeline().dispatch(cfg, backend="numpy").execute()
        rb, pb = gpu.Pipeline().dispatch(cfg, backend="jax").execute()
        ctx = (seed, trial, cfg.runtime_sampler.addressing_mode.name,
               cfg.runtime_sampler.filter.name, max_level,
               "co" if compute_only else "hw")
        _assert_equal(ra, rb, ctx)
        assert pa == pb, ctx


# ---------------------------------------------------------------------------
# Route 4: the mesh= sharded route over the 8-virtual-device mesh — 8 cases
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sharded_mesh(seed):
    import jax

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("omm",))
    rng = np.random.RandomState(555000 + seed)
    for trial in range(2):
        desc = _random_desc(rng)
        a = _bake_or_error(desc, backend="numpy")
        b = _bake_or_error(desc, backend="pallas", mesh=mesh)
        _assert_same_outcome(a, b, (seed, trial, _ctx(desc)))


# ---------------------------------------------------------------------------
# Error-path parity: workload cancel must be backend-independent
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_fuzz_workload_cancel_parity(backend):
    rng = np.random.RandomState(7)
    desc = _random_desc(rng)
    desc.max_workload_size = 1
    with pytest.raises(omm.BakeError) as ei:
        omm.bake(desc, backend=backend)
    assert ei.value.result == omm.Result.WORKLOAD_TOO_BIG
