"""Per-triangle subdivision levels + index format thresholds.

Ports of test_subdiv.cpp (histogram self-consistency over mixed per-prim
levels) and test_omm_indexing.cpp (8/16/32-bit output index selection)."""
import numpy as np
import pytest

import omm_tpu as omm

from test_gpu_baker import validate_histograms


def _checkerboard(n=64):
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return np.where(i % 2 != j % 2, np.float32(0.0),
                    np.float32(1.0)).astype(np.float32)


def _bake_index_count(tri_count, allow8, force32):
    """test_omm_indexing.cpp fixture: tiny texture, trivial UVs."""
    tex = omm.Texture([np.full((4, 4), 0.9, np.float32)],
                      omm.TextureFormat.FP32)
    rng = np.random.RandomState(7)
    tc = rng.rand(3 * tri_count, 2).astype(np.float32)
    ib = np.arange(3 * tri_count, dtype=np.uint32)
    flags = omm.BakeFlags.NONE
    if allow8:
        flags |= omm.BakeFlags.Allow8BitIndices
    if force32:
        flags |= omm.BakeFlags.Force32BitIndices
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc, index_buffer=ib, index_count=len(ib),
        bake_flags=flags, dynamic_subdivision_scale=0.0,
        max_subdivision_level=0)
    res = omm.bake(desc)
    assert res.index_count == tri_count
    return res.index_format


# (count, allow8, force32) -> expected format (test_omm_indexing.cpp:122-229)
INDEXING_CASES = [
    (1, False, False, omm.IndexFormat.UINT_16),
    (127, False, False, omm.IndexFormat.UINT_16),
    (128, False, False, omm.IndexFormat.UINT_16),
    (32766, False, False, omm.IndexFormat.UINT_16),
    (32767, False, False, omm.IndexFormat.UINT_16),
    (32768, False, False, omm.IndexFormat.UINT_32),
    (1, False, True, omm.IndexFormat.UINT_32),
    (32767, False, True, omm.IndexFormat.UINT_32),
    (1, True, False, omm.IndexFormat.UINT_8),
    (127, True, False, omm.IndexFormat.UINT_8),
    (128, True, False, omm.IndexFormat.UINT_16),
    (32766, True, False, omm.IndexFormat.UINT_16),
    (1, True, True, omm.IndexFormat.UINT_32),
    (127, True, True, omm.IndexFormat.UINT_32),
]


@pytest.mark.parametrize("count,allow8,force32,expected", INDEXING_CASES)
def test_index_format_threshold(count, allow8, force32, expected):
    assert _bake_index_count(count, allow8, force32) == expected


def _mixed_subdiv_bake(global_lvl, counts):
    """BakeMixedSubDivs analog (test_subdiv.cpp:80-175): checkerboard
    texture (no special indices possible), shuffled per-prim levels with
    0xF = use-global sentinel."""
    tex = omm.Texture([_checkerboard()], omm.TextureFormat.FP32,
                      alpha_cutoff=0.3)
    levels = []
    for lvl, cnt in counts.items():
        levels += [lvl] * cnt
    rng = np.random.RandomState(32)
    levels = np.array(levels, np.uint8)
    rng.shuffle(levels)
    tri_count = len(levels)

    tc = np.zeros((3 * tri_count, 2), np.float32)
    for i in range(tri_count):
        while True:
            t = rng.rand(3, 2).astype(np.float32)
            a = np.cross(t[2] - t[0], t[1] - t[0])
            if a * a >= 1e-6:
                break
        tc[3 * i:3 * i + 3] = t
    ib = np.arange(3 * tri_count, dtype=np.uint32)

    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc, index_buffer=ib, index_count=len(ib),
        alpha_cutoff=0.3, dynamic_subdivision_scale=0.0,
        runtime_sampler=omm.SamplerDesc(
            addressing_mode=omm.TextureAddressMode.Clamp,
            filter=omm.TextureFilterMode.Nearest),
        bake_flags=(omm.BakeFlags.DisableSpecialIndices
                    | omm.BakeFlags.Force32BitIndices
                    | omm.BakeFlags.DisableDuplicateDetection),
        max_subdivision_level=global_lvl,
        subdivision_levels=levels)
    res = omm.bake(desc)
    validate_histograms(res)

    got = np.zeros(5, np.int64)
    for d in res.desc_array:
        got[d.subdivision_level] += 1
    want = np.zeros(5, np.int64)
    for lvl, cnt in counts.items():
        want[global_lvl if lvl == 0xF else lvl] += cnt
    assert (got == want).all(), (got, want)


def test_subdiv_mixed():
    _mixed_subdiv_bake(2, {0xF: 8, 0: 4, 1: 7, 2: 7, 3: 7, 4: 7})


def test_subdiv_mixed2():
    _mixed_subdiv_bake(4, {0xF: 84, 0: 34, 2: 23, 3: 34, 4: 17})


def test_subdiv_lvl_only():
    _mixed_subdiv_bake(2, {1: 26})
    _mixed_subdiv_bake(2, {3: 19})


def test_per_triangle_formats():
    """Per-triangle Format overrides (omm.h:423-425).

    Quirk parity: the reference sizes the output array from the GLOBAL
    format's histogram only (bake_cpu_impl.cpp:1763-1772), so truly mixed
    formats overflow the array and fail the bake; INVALID entries fall
    back to the global format."""
    tex = omm.Texture([_checkerboard()], omm.TextureFormat.FP32)
    tc = np.array([[0, 0], [0, 1], [1, 0],
                   [0.1, 0], [0.1, 1], [1.1, 0]], np.float32)
    ib = np.arange(6, dtype=np.uint32)

    def mkdesc(formats):
        return omm.BakeInputDesc(
            texture=tex, tex_coords=tc, index_buffer=ib, index_count=6,
            dynamic_subdivision_scale=0.0, max_subdivision_level=2,
            format=omm.Format.OC1_4_State, formats=formats,
            bake_flags=(omm.BakeFlags.DisableSpecialIndices
                        | omm.BakeFlags.DisableDuplicateDetection),
            unknown_state_promotion=omm.UnknownStatePromotion.ForceOpaque)

    res = omm.bake(mkdesc(np.array([int(omm.Format.INVALID),
                                    int(omm.Format.OC1_4_State)], np.int32)))
    assert [d.format for d in res.desc_array] == [2, 2]

    with pytest.raises(omm.BakeError) as ei:
        omm.bake(mkdesc(np.array([int(omm.Format.OC1_2_State),
                                  int(omm.Format.OC1_4_State)], np.int32)))
    assert ei.value.result == omm.Result.FAILURE


def test_rejection_threshold():
    """rejectionThreshold discards low-coverage OMMs (omm.h:399-401,
    bake_cpu_impl.cpp:1450-1465).  Left half checkerboard (unknown),
    right half solid (known) so states are non-uniform but mostly
    unknown."""
    j, i = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    noisy = np.where(i % 2 != j % 2, np.float32(0.0),
                     np.float32(1.0)).astype(np.float32)
    noisy[:, 32:] = np.float32(1.0)
    tex = omm.Texture([noisy], omm.TextureFormat.FP32)
    tc = np.array([[0, 0], [0, 1], [1, 0]], np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        dynamic_subdivision_scale=0.0, max_subdivision_level=3,
        rejection_threshold=0.99)
    res = omm.bake(desc)
    assert (res.index_buffer
            == int(omm.SpecialIndex.FullyUnknownTransparent)).all()


def test_max_array_data_size_downsampling():
    """maxArrayDataSize budget (bake_cpu_impl.cpp:1557-1688): the baker
    greedily downsamples the least-valuable OMMs (coverage per byte)
    until the array fits; every triangle still resolves and downsampled
    blocks use lower subdivision levels."""
    import numpy as np
    import omm_tpu as omm
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    rng = np.random.RandomState(5)
    uvs, idxb = [], []
    for q in range(6):
        b = rng.rand(2).astype(np.float32) * 0.5
        base = len(uvs)
        uvs += [b, b + [0, 0.4], b + [0.4, 0], b + [0.4, 0.4]]
        idxb += [base, base + 1, base + 2, base + 3, base + 1, base + 2]
    common = dict(texture=tex, tex_coords=np.asarray(uvs, np.float32),
                  index_buffer=np.asarray(idxb, np.uint32),
                  index_count=len(idxb), max_subdivision_level=6)

    full = omm.bake(omm.BakeInputDesc(**common))
    budget = max(len(full.array_data) // 4, 64)
    tight = omm.bake(omm.BakeInputDesc(max_array_data_size=budget,
                                       **common))
    assert len(full.array_data) > budget
    assert len(tight.array_data) < budget
    # every triangle still has a valid reference
    refs = np.asarray(tight.index_buffer).astype(np.int64)
    assert ((refs >= 0) & (refs < len(tight.desc_array))
            | (refs < 0)).all()
    # downsampling lowered subdivision levels (never raised them)
    assert max(d.subdivision_level for d in tight.desc_array) \
        <= max(d.subdivision_level for d in full.desc_array)
    assert sum(d.subdivision_level for d in tight.desc_array) \
        < sum(d.subdivision_level for d in full.desc_array) \
        or len(tight.desc_array) < len(full.desc_array)
    # stats stay self-consistent
    s = omm.get_stats(tight)
    total = (s.total_opaque + s.total_transparent + s.total_unknown_opaque
             + s.total_unknown_transparent)
    per_tri = sum(
        omm.get_num_micro_triangles(
            tight.desc_array[refs[t]].subdivision_level)
        for t in range(len(refs)) if refs[t] >= 0)
    assert total == per_tri


def test_uv16_texcoord_formats():
    """UV16_FLOAT / UV16_UNORM texcoord decode (geometry.h:191-208,
    glm::unpackUnorm2x16 / unpackHalf2x16): a bake through the packed
    16-bit formats equals the UV32 bake of the dequantized coords."""
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(128, 128)], omm.TextureFormat.FP32)
    uv32 = np.array([[0.0, 0.0], [0.0, 0.75], [0.75, 0.0], [0.75, 0.75]],
                    np.float32)  # exactly representable in fp16
    ib = np.array([0, 1, 2, 3, 1, 2], np.uint32)

    def bake_with(coords, fmt):
        desc = omm.BakeInputDesc(
            texture=tex, tex_coords=coords, tex_coord_format=fmt,
            index_buffer=ib, index_count=6, max_subdivision_level=4,
            dynamic_subdivision_scale=0.0)
        return omm.bake(desc)

    ref = bake_with(uv32, omm.TexCoordFormat.UV32_FLOAT)

    halves = uv32.astype(np.float16).view(np.uint16).astype(np.uint32)
    packed_f16 = (halves[:, 0] | (halves[:, 1] << 16)).astype(np.uint32)
    got = bake_with(packed_f16.view(np.uint8),
                    omm.TexCoordFormat.UV16_FLOAT)
    assert np.array_equal(got.array_data, ref.array_data)
    assert omm.get_stats(got) == omm.get_stats(ref)

    # UNORM path: quantize, then compare against UV32 of the dequantized
    q = np.round(uv32 * 65535.0).astype(np.uint32)
    packed_un = (q[:, 0] | (q[:, 1] << 16)).astype(np.uint32)
    deq = np.stack([(q[:, 0].astype(np.float32) / np.float32(65535.0)),
                    (q[:, 1].astype(np.float32) / np.float32(65535.0))],
                   axis=-1).astype(np.float32)
    ref_un = bake_with(deq, omm.TexCoordFormat.UV32_FLOAT)
    got_un = bake_with(packed_un.view(np.uint8),
                       omm.TexCoordFormat.UV16_UNORM)
    assert np.array_equal(got_un.array_data, ref_un.array_data)

    # strided UV32 fetch (stride > 8 bytes: interleaved vertex data)
    inter = np.zeros((4, 4), np.float32)
    inter[:, 0:2] = uv32
    ref_strided = omm.bake(omm.BakeInputDesc(
        texture=tex, tex_coords=inter.reshape(-1).view(np.uint8),
        tex_coord_format=omm.TexCoordFormat.UV32_FLOAT,
        tex_coord_stride_in_bytes=16,
        index_buffer=ib, index_count=6, max_subdivision_level=4,
        dynamic_subdivision_scale=0.0))
    assert np.array_equal(ref_strided.array_data, ref.array_data)


def test_subdiv_10_bake():
    """High-subdivision bake (N=10, 1M micro-tris/tri) stays exact:
    stats sum to 4^N and the packed array length matches the OC1 layout
    (omm.h:436-440 allows N <= 12 on the CPU path)."""
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0.05, 0.05], [0.1, 0.9], [0.9, 0.8]],
                            np.float32),
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        max_subdivision_level=10, dynamic_subdivision_scale=0.0)
    res = omm.bake(desc)
    M = omm.get_num_micro_triangles(10)
    s = omm.get_stats(res)
    assert (s.total_opaque + s.total_transparent
            + s.total_unknown_opaque + s.total_unknown_transparent) == M
    assert len(res.desc_array) == 1
    assert res.array_data.size == M // 4  # 4-state: 2 bits per micro-tri

    # micro-states decode must agree with a direct fine resample
    from omm_tpu import engine, stats
    d = res.desc_array[0]
    states = stats.decode_states(res.array_data, d.offset,
                                 d.subdivision_level, d.format)
    cfg = engine.ResampleConfig(
        addr_mode=desc.runtime_sampler.addressing_mode,
        filter=desc.runtime_sampler.filter,
        alpha_cutoff=desc.alpha_cutoff,
        border_alpha=desc.runtime_sampler.border_alpha,
        fmt=desc.format, promotion=desc.unknown_state_promotion,
        cutoff_gt=desc.alpha_cutoff_greater,
        cutoff_le=desc.alpha_cutoff_less_equal)
    tri = desc.tex_coords[:3].astype(np.float32)
    UO = int(omm.OpacityState.UnknownOpaque)
    want = engine.resample_fine_item(
        tex, cfg, tri, 10,
        engine.resample_coarse_item(tex, cfg, tri, 10,
                                    np.full(M, UO, np.uint8)))
    assert np.array_equal(states, want)


def test_subdiv_10_pallas_parity():
    """The production two-phase/Pallas engine honors the same N <= 12
    subdivision contract as the reference GPU compute path
    (bake_gpu_impl.cpp:255): at N=10 (1M micro-tris) its full bake must
    be stat-identical to the numpy oracle.  (N=11/12 verified the same
    way out-of-suite; they cost 30-140s on the CPU mesh.)"""
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0.05, 0.05], [0.1, 0.9], [0.9, 0.8]],
                            np.float32),
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        max_subdivision_level=10, dynamic_subdivision_scale=0.0)
    a = omm.bake(desc, backend="numpy")
    b = omm.bake(desc, backend="pallas")
    assert omm.get_stats(a) == omm.get_stats(b)
    assert np.array_equal(a.array_data, b.array_data)
