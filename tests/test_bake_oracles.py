"""Bake parity oracles: expected stats are hard-coded values from the
reference test suite (support/tests/test_omm_bake_cpu.cpp) — exact equality
is the bit-exactness contract (SURVEY.md §4)."""
import numpy as np
import pytest

import omm_tpu as omm

from fixtures import (bake_stats, expect_stats, hexagons, julia, mandelbrot,
                      sine_fp32, sine_unorm8, standard_circle)


@pytest.fixture(scope="module")
def circle1024():
    return standard_circle(1024, 1024)


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4])
def test_all_opaque(level):
    tex = np.full((1024, 1024), 0.6, dtype=np.float32)
    expect_stats(bake_stats(tex, 0.5, level), total_fully_opaque=2)


@pytest.mark.parametrize("level", [1, 2, 3, 4])
def test_all_transparent(level):
    tex = np.full((1024, 1024), 0.4, dtype=np.float32)
    expect_stats(bake_stats(tex, 0.5, level), total_fully_transparent=2)


def test_all_unknown_transparent():
    j, i = np.meshgrid(np.arange(1024), np.arange(1024), indexing="ij")
    tex = np.where(i % 8 != j % 8, np.float32(0.0), np.float32(1.0))
    expect_stats(bake_stats(tex.astype(np.float32), 0.5, 1),
                 total_fully_unknown_transparent=2)


def test_all_unknown_opaque():
    j, i = np.meshgrid(np.arange(1024), np.arange(1024), indexing="ij")
    tex = np.where(i % 8 != j % 8, np.float32(1.0), np.float32(0.0))
    expect_stats(bake_stats(tex.astype(np.float32), 0.5, 1),
                 total_fully_unknown_opaque=2)


def test_all_transparent_opaque_corner4():
    tex = np.full((1024, 1024), 0.4, dtype=np.float32)
    tex[0, 0] = np.float32(0.6)
    M = omm.get_num_micro_triangles(4)
    expect_stats(bake_stats(tex, 0.5, 4),
                 total_transparent=M - 1, total_unknown_transparent=1,
                 total_fully_transparent=1)


def test_circle(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 4),
                 total_opaque=204, total_transparent=219,
                 total_unknown_transparent=39, total_unknown_opaque=50)


def test_circle_merge_similar(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 4, merge_similar=True),
                 total_opaque=200, total_transparent=216,
                 total_unknown_transparent=42, total_unknown_opaque=54)


def test_circle_oc2(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 4, fmt=omm.Format.OC1_2_State),
                 total_opaque=254, total_transparent=258)


def test_sine():
    expect_stats(bake_stats(sine_fp32(1024, 1024), 0.5, 4),
                 total_opaque=224, total_transparent=128,
                 total_unknown_transparent=96, total_unknown_opaque=64)


def test_sine_oc2():
    expect_stats(bake_stats(sine_fp32(1024, 1024), 0.5, 4,
                            fmt=omm.Format.OC1_2_State),
                 total_opaque=288, total_transparent=224)


def test_sine_unorm8():
    expect_stats(bake_stats(sine_unorm8(1024, 1024), 0.5, 4, unorm8=True),
                 total_opaque=128, total_transparent=256,
                 total_unknown_transparent=48, total_unknown_opaque=80)


# Reference SineOC2Neg (test_omm_bake_cpu.cpp:1063-1081) is byte-identical
# to SineOC2 (same lambda, same options, same expected stats), so it is
# intentionally not duplicated here.


def test_mandelbrot():
    expect_stats(bake_stats(mandelbrot(1024, 1024), 0.5, 5),
                 total_opaque=1212, total_transparent=484,
                 total_unknown_transparent=124, total_unknown_opaque=228)


def test_mandelbrot2():
    tc = np.array([[0.2, 0.0], [0.1, 0.8], [0.9, 0.1]], dtype=np.float32)
    expect_stats(bake_stats(mandelbrot(1024, 1024), 0.5, 5, tex_coords=tc,
                            indices=[0, 1, 2]),
                 total_opaque=521, total_transparent=286,
                 total_unknown_transparent=82, total_unknown_opaque=135)


@pytest.mark.slow
def test_mandelbrot3():
    tc = np.array([[0.2, 0.0], [0.1, 0.8], [0.9, 0.1]], dtype=np.float32)
    expect_stats(bake_stats(mandelbrot(1024, 1024), 0.5, 9, tex_coords=tc,
                            indices=[0, 1, 2]),
                 total_opaque=164040, total_transparent=91320,
                 total_unknown_transparent=3039, total_unknown_opaque=3745)


@pytest.mark.slow
def test_julia():
    tc = np.array([[0.2, 0.0], [0.1, 0.8], [0.9, 0.1]], dtype=np.float32)
    expect_stats(bake_stats(julia(1024, 1024), 0.5, 9, tex_coords=tc,
                            indices=[0, 1, 2]),
                 total_opaque=254265, total_transparent=5055,
                 total_unknown_transparent=1336, total_unknown_opaque=1488)


@pytest.fixture(scope="module")
def julia_u8():
    """JuliaUNORM8 texel lambda (test_omm_bake_cpu.cpp:1323-1326):
    (uint8_t)std::clamp(GetJulia(..) * 255.f, 0.f, 255.f)."""
    val = julia(1024, 1024)
    return np.clip(val * np.float32(255.0), np.float32(0.0),
                   np.float32(255.0)).astype(np.uint8)


JULIA_TC = np.array([[0.2, 0.0], [0.1, 0.8], [0.9, 0.1]], dtype=np.float32)


@pytest.mark.slow
def test_julia_unorm8(julia_u8):
    """JuliaUNORM8 (test_omm_bake_cpu.cpp:1314-1335)."""
    expect_stats(bake_stats(julia_u8, 0.5, 9, tex_coords=JULIA_TC,
                            indices=[0, 1, 2], unorm8=True),
                 total_opaque=254251, total_transparent=5176,
                 total_unknown_transparent=1215, total_unknown_opaque=1502)


@pytest.mark.slow
def test_julia_t_and_uo(julia_u8):
    """Julia_T_AND_UO (test_omm_bake_cpu.cpp:1337-1361): alphaCutoffGreater
    remapped to UnknownOpaque folds all opaque µtris into UO."""
    expect_stats(bake_stats(julia_u8, 0.5, 9, tex_coords=JULIA_TC,
                            indices=[0, 1, 2], unorm8=True,
                            cutoff_le=omm.OpacityState.Transparent,
                            cutoff_gt=omm.OpacityState.UnknownOpaque),
                 total_opaque=0, total_transparent=5176,
                 total_unknown_transparent=1215,
                 total_unknown_opaque=1502 + 254251)


@pytest.mark.slow
def test_julia_flip_t_and_o(julia_u8):
    """Julia_FLIP_T_AND_O (test_omm_bake_cpu.cpp:1363-1387): LE→Opaque,
    GT→Transparent swaps the roles of every state."""
    expect_stats(bake_stats(julia_u8, 0.5, 9, tex_coords=JULIA_TC,
                            indices=[0, 1, 2], unorm8=True,
                            cutoff_le=omm.OpacityState.Opaque,
                            cutoff_gt=omm.OpacityState.Transparent),
                 total_opaque=5176, total_transparent=254251,
                 total_unknown_transparent=1502, total_unknown_opaque=1215)


def _pack_uv16(uv32, unorm):
    """Reference ConvertTexCoords (test_omm_bake_cpu.cpp:116-134):
    glm::packUnorm2x16 / packHalf2x16 per vertex, one u32 each."""
    if unorm:
        q = np.floor(np.clip(uv32, np.float32(0.0), np.float32(1.0))
                     * np.float32(65535.0) + np.float32(0.5)).astype(np.uint32)
    else:
        q = uv32.astype(np.float16).view(np.uint16).astype(np.uint32)
    return (q[:, 0] | (q[:, 1] << 16)).astype(np.uint32).view(np.uint8)


@pytest.mark.slow
def test_julia_uvfp16():
    """Julia_UVFP16 (test_omm_bake_cpu.cpp:1266-1288): the same bake
    through packed half-float texcoords shifts the quantized UVs."""
    expect_stats(bake_stats(julia(1024, 1024), 0.5, 9,
                            tex_coords=_pack_uv16(JULIA_TC, unorm=False),
                            tex_coord_format=omm.TexCoordFormat.UV16_FLOAT,
                            indices=[0, 1, 2]),
                 total_opaque=254321, total_transparent=5108,
                 total_unknown_transparent=1264, total_unknown_opaque=1451)


@pytest.mark.slow
def test_julia_uv_unorm16():
    """Julia_UV_UNORM16 (test_omm_bake_cpu.cpp:1290-1312)."""
    expect_stats(bake_stats(julia(1024, 1024), 0.5, 9,
                            tex_coords=_pack_uv16(JULIA_TC, unorm=True),
                            tex_coord_format=omm.TexCoordFormat.UV16_UNORM,
                            indices=[0, 1, 2]),
                 total_opaque=254325, total_transparent=5110,
                 total_unknown_transparent=1284, total_unknown_opaque=1425)


def test_uniform_4x4():
    vals = np.array([[0.9, 0.1], [0.1, 0.7]], dtype=np.float32)
    j, i = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    tex = (np.float32(1.0) - vals[j % 2, i % 2]).astype(np.float32)
    tc = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32)
    expect_stats(bake_stats(tex, 0.5, 6, tex_coords=tc,
                            indices=[0, 1, 2, 1, 2, 3]),
                 total_opaque=5132, total_transparent=2393,
                 total_unknown_transparent=357, total_unknown_opaque=310)


def test_hexagons_lvl6():
    tc = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32)
    expect_stats(bake_stats(hexagons(1024, 1024), 0.5, 6, tex_coords=tc,
                            indices=[0, 1, 2, 1, 2, 3]),
                 total_opaque=902, total_transparent=0,
                 total_unknown_transparent=3, total_unknown_opaque=7287)


def _hex_reuse_geometry(N=32, M=32):
    indices = []
    tcs = []
    for j in range(M):
        for i in range(N):
            off = 3 * (i + j * N)
            indices += [off, off + 1, off + 2]
            ox = np.float32(i) / np.float32(N)
            oy = np.float32(j) / np.float32(M)
            tcs.append([ox + np.float32(0.0) / N, oy + np.float32(0.0) / M])
            tcs.append([ox + np.float32(0.0) / N, oy + np.float32(1.0) / M])
            tcs.append([ox + np.float32(1.0) / N, oy + np.float32(1.0) / M])
    return (np.array(indices, dtype=np.uint32),
            np.array(tcs, dtype=np.float32))


def test_hexagons_reuse_lvl2():
    idx, tc = _hex_reuse_geometry()
    expect_stats(bake_stats(hexagons(1024, 1024), 0.5, 2, tex_coords=tc,
                            indices=idx),
                 total_opaque=6933, total_unknown_transparent=1935,
                 total_unknown_opaque=7516)


def test_hexagons_reuse_lvl3():
    idx, tc = _hex_reuse_geometry()
    expect_stats(bake_stats(hexagons(1024, 1024), 0.5, 3, tex_coords=tc,
                            indices=idx),
                 total_opaque=40134, total_transparent=250,
                 total_unknown_transparent=11939, total_unknown_opaque=13213)


@pytest.mark.slow
def test_hexagons_lvl8():
    """HexagonsLvl8 (test_omm_bake_cpu.cpp:1454-1484)."""
    tc = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32)
    expect_stats(bake_stats(hexagons(1024, 1024), 0.5, 8, tex_coords=tc,
                            indices=[0, 1, 2, 1, 2, 3]),
                 total_opaque=77995, total_transparent=535,
                 total_unknown_transparent=23163, total_unknown_opaque=29379)


@pytest.mark.slow
def test_hexagons_reuse_lvl4():
    """HexagonsReuseLvl4 (test_omm_bake_cpu.cpp:1579-1624)."""
    idx, tc = _hex_reuse_geometry()
    expect_stats(bake_stats(hexagons(1024, 1024), 0.5, 4, tex_coords=tc,
                            indices=idx),
                 total_opaque=187129, total_transparent=17979,
                 total_unknown_transparent=30309, total_unknown_opaque=26727)


@pytest.mark.slow
def test_hexagons_reuse_lvl5():
    """HexagonsReuseLvl5 (test_omm_bake_cpu.cpp:1626-1671)."""
    idx, tc = _hex_reuse_geometry()
    expect_stats(bake_stats(hexagons(1024, 1024), 0.5, 5, tex_coords=tc,
                            indices=idx),
                 total_opaque=796515, total_transparent=138195,
                 total_unknown_transparent=56743, total_unknown_opaque=57123)


@pytest.mark.slow
def test_hexagons_reuse_lsh():
    idx, tc = _hex_reuse_geometry()
    expect_stats(bake_stats(hexagons(1024, 1024), 0.5, 4, tex_coords=tc,
                            indices=idx, merge_similar=True),
                 total_opaque=170724, total_transparent=11380,
                 total_unknown_transparent=37864, total_unknown_opaque=39104,
                 total_fully_transparent=12)


# --- degenerate triangles (test_omm_bake_cpu.cpp:2306-2534) ---

DEGEN_TC = np.array([[0.2, 0.0], [0.2, 0.437582970], [0.2, 0.218791485]],
                    dtype=np.float32)


def test_degen_default_lvl1(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 1, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2]),
                 total_opaque=1, total_unknown_transparent=1,
                 total_unknown_opaque=2)


def test_degen_default_lvl2(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 2, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2]),
                 total_opaque=6, total_transparent=3,
                 total_unknown_transparent=3, total_unknown_opaque=4)


def test_degen_default_horizontal(circle1024):
    tc = np.array([[0.2, 0.2], [0.3, 0.2], [0.41, 0.2]], dtype=np.float32)
    expect_stats(bake_stats(circle1024, 0.5, 1, tex_coords=tc,
                            indices=[0, 1, 2]),
                 total_transparent=3, total_unknown_transparent=1)


def test_degen_default_diagonal(circle1024):
    tc = np.array([[0.2, 0.2], [0.3, 0.2], [0.4, 0.2]], dtype=np.float32)
    expect_stats(bake_stats(circle1024, 0.5, 2, tex_coords=tc,
                            indices=[0, 1, 2]),
                 total_transparent=13, total_unknown_transparent=2,
                 total_unknown_opaque=1)


def test_degen_default_lvl3(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 3, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2]),
                 total_opaque=28, total_transparent=21,
                 total_unknown_transparent=7, total_unknown_opaque=8)


def test_degen_default_lvl4(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 4, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2]),
                 total_opaque=136, total_transparent=91,
                 total_unknown_transparent=14, total_unknown_opaque=15)


def test_degen_default_lvl4_wrap(circle1024):
    tc = DEGEN_TC.copy()
    tc[:, 0] = np.float32(-0.8)
    expect_stats(bake_stats(circle1024, 0.5, 4, tex_coords=tc,
                            indices=[0, 1, 2],
                            addressing_mode=omm.TextureAddressMode.Wrap),
                 total_opaque=136, total_transparent=91,
                 total_unknown_transparent=14, total_unknown_opaque=15)


def test_degen_dyn_lvl_2(circle1024):
    expect_stats(bake_stats(circle1024, 0.5, 12, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2],
                            dynamic_subdivision_scale=2.0),
                 total_opaque=37333, total_transparent=27495,
                 total_unknown_transparent=353, total_unknown_opaque=355)


@pytest.mark.slow
def test_degen_dyn_lvl_0_1(circle1024):
    """Degen_Default_dyn_lvl_0_1 (test_omm_bake_cpu.cpp:2423-2438): scale
    0.1 resolves to the full level-12 line (16.7M µtris)."""
    expect_stats(bake_stats(circle1024, 0.5, 12, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2],
                            dynamic_subdivision_scale=0.1),
                 total_opaque=9642463, total_transparent=7108335,
                 total_unknown_transparent=3771, total_unknown_opaque=22647)


@pytest.mark.slow
def test_degen_dyn_lvl_0_5(circle1024):
    """Degen_Default_dyn_lvl_0_5 (test_omm_bake_cpu.cpp:2440-2455)."""
    expect_stats(bake_stats(circle1024, 0.5, 12, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2],
                            dynamic_subdivision_scale=0.5),
                 total_opaque=601591, total_transparent=443211,
                 total_unknown_transparent=942, total_unknown_opaque=2832)


def test_degen_dyn_lvl_3(circle1024):
    """Degen_Default_dyn_lvl_3 (test_omm_bake_cpu.cpp:2474-2489) — same
    resolved level as scale=2, so identical stats."""
    expect_stats(bake_stats(circle1024, 0.5, 12, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2],
                            dynamic_subdivision_scale=3.0),
                 total_opaque=37333, total_transparent=27495,
                 total_unknown_transparent=353, total_unknown_opaque=355)


def test_degen_dyn_lvl_10(circle1024):
    """Degen_Default_dyn_lvl_10 (test_omm_bake_cpu.cpp:2491-2506)."""
    expect_stats(bake_stats(circle1024, 0.5, 12, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2],
                            dynamic_subdivision_scale=10.0),
                 total_opaque=2266, total_transparent=1653,
                 total_unknown_transparent=87, total_unknown_opaque=90)


@pytest.mark.slow
def test_level12_non_degenerate(circle1024):
    """A REAL (non-line) triangle at the reference's subdivision ceiling,
    level 12 = 16.7M µtris (omm.h:436-440; the reference CS path bakes it,
    bake_gpu_impl.cpp:253-267).  The degenerate dyn-scale tests above hit
    level 12 only on line triangles; this pins the full 2-D classify at
    the ceiling.  Stats are numpy-oracle-generated pins (same discipline
    as the raster goldens), sanity-bounded here: the unknown band must be
    a thin contour (~0.05% of µtris on this circle/triangle geometry) and
    every µtri accounted for."""
    tc = np.array([[0.05, 0.1], [0.1, 0.8], [0.75, 0.7]], np.float32)
    s = bake_stats(circle1024, 0.5, 12, tex_coords=tc, indices=[0, 1, 2])
    M = omm.get_num_micro_triangles(12)
    got = (s.total_opaque, s.total_transparent,
           s.total_unknown_transparent, s.total_unknown_opaque)
    assert got == (3005036, 13763679, 4405, 4096)
    assert sum(got) == M
    assert (got[2] + got[3]) < M // 1000  # unknowns = thin contour band


@pytest.mark.slow
def test_level12_non_degenerate_backend_parity(circle1024):
    """Level-12 full-result byte equality between the numpy oracle backend
    and the device (pallas/twophase) backend — the bit-exactness contract
    at the subdivision ceiling."""
    tc = np.array([[0.05, 0.1], [0.1, 0.8], [0.75, 0.7]], np.float32)
    tex = omm.Texture([circle1024], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.arange(3, dtype=np.uint32), index_count=3,
        alpha_cutoff=0.5, max_subdivision_level=12,
        dynamic_subdivision_scale=0.0)
    a = omm.bake(desc, backend="numpy")
    b = omm.bake(desc, backend="pallas")
    assert (a.array_data == b.array_data).all()
    assert a.desc_array == b.desc_array
    assert (a.index_buffer == b.index_buffer).all()
    assert a.desc_array_histogram == b.desc_array_histogram


def test_degen_point_transparent(circle1024):
    tc = np.array([[0.2, 0.437582970]] * 3, dtype=np.float32)
    expect_stats(bake_stats(circle1024, 0.5, 12, tex_coords=tc,
                            indices=[0, 1, 2],
                            dynamic_subdivision_scale=2.0),
                 total_fully_transparent=1)


def test_degen_point_opaque(circle1024):
    tc = np.array([[0.2, 0.1]] * 3, dtype=np.float32)
    expect_stats(bake_stats(circle1024, 0.5, 12, tex_coords=tc,
                            indices=[0, 1, 2],
                            dynamic_subdivision_scale=2.0),
                 total_fully_opaque=1)


def test_invalid_fully_unknown_transparent(circle1024):
    tc = np.array([[0.0, 0.0], [0.0, np.nan], [0.0, 0.221271083]],
                  dtype=np.float32)
    expect_stats(bake_stats(circle1024, 0.5, 4, tex_coords=tc,
                            indices=[0, 1, 2],
                            unresolved=omm.SpecialIndex.FullyUnknownTransparent),
                 total_fully_unknown_transparent=1)


def test_workload_too_big(circle1024):
    with pytest.raises(omm.BakeError) as ei:
        bake_stats(circle1024, 0.5, 9, tex_coords=np.array(
            [[0.35, 0.1], [0.1, 0.9], [0.9, 0.8]], dtype=np.float32),
            indices=[0, 1, 2], max_workload_size=512)
    assert ei.value.result == omm.Result.WORKLOAD_TOO_BIG


# --- degenerate triangles on the DEVICE backend (round-2: host DDA
# schedule + exact level-line kernel on device, no host classify) ---

def _assert_no_host_classify(monkeypatch):
    """Fail the test if the host fine pass is invoked."""
    from omm_tpu import engine as _eng

    def boom(*a, **k):
        raise AssertionError("host resample_fine_item called on the "
                             "device backend for a degenerate item")

    monkeypatch.setattr(_eng, "resample_fine_item", boom)


@pytest.mark.parametrize("level,expect", [
    (1, dict(total_opaque=1, total_unknown_transparent=1,
             total_unknown_opaque=2)),
    (2, dict(total_opaque=6, total_transparent=3,
             total_unknown_transparent=3, total_unknown_opaque=4)),
    (3, dict(total_opaque=28, total_transparent=21,
             total_unknown_transparent=7, total_unknown_opaque=8)),
    (4, dict(total_opaque=136, total_transparent=91,
             total_unknown_transparent=14, total_unknown_opaque=15)),
])
def test_degen_device_backend(circle1024, level, expect, monkeypatch):
    _assert_no_host_classify(monkeypatch)
    expect_stats(bake_stats(circle1024, 0.5, level, tex_coords=DEGEN_TC,
                            indices=[0, 1, 2], backend="pallas"),
                 **expect)


def test_degen_device_backend_wrap(circle1024, monkeypatch):
    _assert_no_host_classify(monkeypatch)
    tc = DEGEN_TC.copy()
    tc[:, 0] = np.float32(-0.8)
    expect_stats(bake_stats(circle1024, 0.5, 4, tex_coords=tc,
                            indices=[0, 1, 2], backend="pallas",
                            addressing_mode=omm.TextureAddressMode.Wrap),
                 total_opaque=136, total_transparent=91,
                 total_unknown_transparent=14, total_unknown_opaque=15)


def test_degen_device_backend_horizontal(circle1024, monkeypatch):
    _assert_no_host_classify(monkeypatch)
    tc = np.array([[0.2, 0.2], [0.3, 0.2], [0.41, 0.2]], dtype=np.float32)
    expect_stats(bake_stats(circle1024, 0.5, 1, tex_coords=tc,
                            indices=[0, 1, 2], backend="pallas"),
                 total_transparent=3, total_unknown_transparent=1)


def test_degen_device_backend_multimip(monkeypatch):
    """Degenerate item over a 3-mip chain: device path accumulates mips
    with the reference's early-unknown-exit masking — equals the host
    oracle exactly."""
    from omm_tpu import engine as _eng
    rng = np.random.RandomState(9)
    mips = [rng.rand(128 >> k, 128 >> k).astype(np.float32)
            for k in range(3)]
    want = bake_stats(mips[0], 0.5, 3, tex_coords=DEGEN_TC,
                      indices=[0, 1, 2], mips=mips, backend="numpy")
    _assert_no_host_classify(monkeypatch)
    got = bake_stats(mips[0], 0.5, 3, tex_coords=DEGEN_TC,
                     indices=[0, 1, 2], mips=mips, backend="pallas")
    assert got == want
