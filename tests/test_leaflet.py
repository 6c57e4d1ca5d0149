"""Leaflet (real foliage alpha) oracle tests: mip-chain sweeps and
per-level sweeps (test_omm_bake_cpu.cpp:640-746, 1721-2032).

Uses the reference's test asset read-only; skipped if not mounted."""
import os

import numpy as np
import pytest

import omm_tpu as omm

from fixtures import expect_stats

LEAFLET = "/root/reference/assets/tests/leaflet.png"

pytestmark = pytest.mark.skipif(not os.path.exists(LEAFLET),
                                reason="leaflet.png asset not mounted")


@pytest.fixture(scope="module")
def leaflet_alpha():
    from PIL import Image
    img = np.asarray(Image.open(LEAFLET))
    # channel 2 (blue), inverted (test_omm_bake_cpu.cpp:662-669, 706-709)
    return np.float32(1.0) - img[..., 2].astype(np.float32) / np.float32(255.0)


def _gen_mips(base: np.ndarray, count: int):
    """2x2 average filter chain (test_omm_bake_cpu.cpp:671-695), fp32."""
    mips = [base]
    cur = base
    for _ in range(count - 1):
        h, w = cur.shape
        hh, hw = h // 2, w // 2
        p0 = cur[0:2 * hh:2, 0:2 * hw:2]
        p1 = cur[1:2 * hh:2, 0:2 * hw:2]
        p2 = cur[0:2 * hh:2, 1:2 * hw:2]
        p3 = cur[1:2 * hh:2, 1:2 * hw:2]
        nxt = ((p0 + p1 + p2 + p3) * np.float32(0.25)).astype(np.float32)
        mips.append(nxt)
        cur = nxt
    return mips


def _leaflet_mip_n(alpha, mip_start, num_mips, alpha_cutoff=0.5):
    """LeafletMipN (test_omm_bake_cpu.cpp:640-713)."""
    mips = _gen_mips(alpha, mip_start + num_mips)[mip_start:]
    tex = omm.Texture(mips, omm.TextureFormat.FP32)
    tc = np.array([[0.05, 0.1], [0.1, 0.9], [0.9, 0.9]], np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        alpha_cutoff=alpha_cutoff, dynamic_subdivision_scale=0.0,
        unknown_state_promotion=omm.UnknownStatePromotion.Nearest,
        runtime_sampler=omm.SamplerDesc(
            addressing_mode=omm.TextureAddressMode.Clamp,
            filter=omm.TextureFilterMode.Linear),
        bake_flags=omm.BakeFlags.EnableInternalThreads,
        max_subdivision_level=6)
    return omm.get_stats(omm.bake(desc))


def _leaflet_level_n(alpha, subdiv):
    """LeafletLevelN (test_omm_bake_cpu.cpp:715-746)."""
    tex = omm.Texture([alpha], omm.TextureFormat.FP32)
    tc = np.array([[0.35, 0.1], [0.1, 0.9], [0.9, 0.8]], np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        alpha_cutoff=0.5, dynamic_subdivision_scale=0.0,
        unknown_state_promotion=omm.UnknownStatePromotion.Nearest,
        bake_flags=(omm.BakeFlags.EnableInternalThreads
                    | omm.BakeFlags.DisableSpecialIndices),
        max_subdivision_level=subdiv)
    return omm.get_stats(omm.bake(desc))


MIP_ORACLES = {
    (0, 1, 0.2): dict(total_opaque=864, total_transparent=2712,
                      total_unknown_transparent=275, total_unknown_opaque=245),
    (0, 1, 0.5): dict(total_opaque=817, total_transparent=2763,
                      total_unknown_transparent=232, total_unknown_opaque=284),
    (0, 2, 0.5): dict(total_opaque=809, total_transparent=2720,
                      total_unknown_transparent=275, total_unknown_opaque=292),
    (0, 3, 0.5): dict(total_opaque=784, total_transparent=2688,
                      total_unknown_transparent=307, total_unknown_opaque=317),
    (0, 4, 0.5): dict(total_opaque=776, total_transparent=2684,
                      total_unknown_transparent=311, total_unknown_opaque=325),
    (0, 5, 0.5): dict(total_opaque=724, total_transparent=2586,
                      total_unknown_transparent=409, total_unknown_opaque=377),
    (0, 6, 0.5): dict(total_opaque=615, total_transparent=2430,
                      total_unknown_transparent=565, total_unknown_opaque=486),
    (0, 7, 0.5): dict(total_opaque=349, total_transparent=2408,
                      total_unknown_transparent=587, total_unknown_opaque=752),
    (0, 8, 0.5): dict(total_opaque=0, total_transparent=2408,
                      total_unknown_transparent=587, total_unknown_opaque=1101),
    (1, 1, 0.5): dict(total_opaque=847, total_transparent=2728,
                      total_unknown_transparent=248, total_unknown_opaque=273),
    (2, 1, 0.5): dict(total_opaque=857, total_transparent=2725,
                      total_unknown_transparent=268, total_unknown_opaque=246),
    (3, 1, 0.5): dict(total_opaque=867, total_transparent=2735,
                      total_unknown_transparent=239, total_unknown_opaque=255),
    (4, 1, 0.5): dict(total_opaque=928, total_transparent=2777,
                      total_unknown_transparent=199, total_unknown_opaque=192),
    (5, 1, 0.5): dict(total_opaque=965, total_transparent=2821,
                      total_unknown_transparent=156, total_unknown_opaque=154),
    (6, 1, 0.5): dict(total_opaque=526, total_transparent=3335,
                      total_unknown_transparent=119, total_unknown_opaque=116),
}


@pytest.mark.parametrize("key", sorted(MIP_ORACLES))
def test_leaflet_mips(leaflet_alpha, key):
    mip_start, num, cutoff = key
    expect_stats(_leaflet_mip_n(leaflet_alpha, mip_start, num, cutoff),
                 **MIP_ORACLES[key])


LEVEL_ORACLES = {
    0: dict(total_unknown_transparent=1),
    1: dict(total_unknown_transparent=4),
    2: dict(total_transparent=1, total_unknown_transparent=10,
            total_unknown_opaque=5),
    3: dict(total_transparent=16, total_unknown_transparent=31,
            total_unknown_opaque=17),
    4: dict(total_opaque=35, total_transparent=108,
            total_unknown_transparent=68, total_unknown_opaque=45),
    5: dict(total_opaque=207, total_transparent=554,
            total_unknown_transparent=139, total_unknown_opaque=124),
    6: dict(total_opaque=1021, total_transparent=2508,
            total_unknown_transparent=275, total_unknown_opaque=292),
    7: dict(total_opaque=4666, total_transparent=10580,
            total_unknown_transparent=549, total_unknown_opaque=589),
}


@pytest.mark.parametrize("level", sorted(LEVEL_ORACLES))
def test_leaflet_levels(leaflet_alpha, level):
    expect_stats(_leaflet_level_n(leaflet_alpha, level),
                 **LEVEL_ORACLES[level])


@pytest.mark.slow
def test_leaflet_level8(leaflet_alpha):
    expect_stats(_leaflet_level_n(leaflet_alpha, 8),
                 total_opaque=19831, total_transparent=43424,
                 total_unknown_transparent=1110, total_unknown_opaque=1171)


def test_leaflet_level12_too_big_workload(leaflet_alpha):
    """LeafletLevel12_TooBigWorkload (test_omm_bake_cpu.cpp:2020-2031):
    a 512-texel workload budget cancels the level-12 bake."""
    tex = omm.Texture([leaflet_alpha], omm.TextureFormat.FP32)
    tc = np.array([[0.35, 0.1], [0.1, 0.9], [0.9, 0.8]], np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        alpha_cutoff=0.5, dynamic_subdivision_scale=0.0,
        unknown_state_promotion=omm.UnknownStatePromotion.Nearest,
        bake_flags=(omm.BakeFlags.EnableInternalThreads
                    | omm.BakeFlags.DisableSpecialIndices),
        max_subdivision_level=12, max_workload_size=512)
    with pytest.raises(omm.BakeError) as ei:
        omm.bake(desc)
    assert ei.value.result == omm.Result.WORKLOAD_TOO_BIG
