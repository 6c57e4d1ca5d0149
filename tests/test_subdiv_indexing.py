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
