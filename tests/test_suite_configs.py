"""Suite-config matrix: the reference re-instantiates its whole bake suite
under {Default, DisableZOrder, Force32BitIndices, UNORM8, AlphaCutoff,
Serialize} expecting identical stats (test_omm_bake_cpu.cpp:2581-2589).
The AlphaCutoff config embeds the cutoff in the texture, activating the
coarse SAT pre-pass — identical results prove SAT/fine agreement."""
import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import serialize as ser

from fixtures import bake_stats, expect_stats, standard_circle, sine_fp32

CIRCLE_STATS = dict(total_opaque=204, total_transparent=219,
                    total_unknown_transparent=39, total_unknown_opaque=50)
SINE_STATS = dict(total_opaque=224, total_transparent=128,
                  total_unknown_transparent=96, total_unknown_opaque=64)


@pytest.fixture(scope="module")
def circle():
    return standard_circle(1024, 1024)


@pytest.mark.parametrize("cfg", ["embed_cutoff", "force32"])
def test_circle_configs(circle, cfg):
    kw = {cfg: True} if cfg != "unorm8" else {}
    expect_stats(bake_stats(circle, 0.5, 4, **kw), **CIRCLE_STATS)


def test_circle_unorm8(circle):
    u8 = (circle * np.float32(255.0)).astype(np.uint8)
    expect_stats(bake_stats(u8, 0.5, 4, unorm8=True), **CIRCLE_STATS)


@pytest.mark.parametrize("cfg", ["embed_cutoff", "force32"])
def test_sine_configs(cfg):
    kw = {cfg: True}
    expect_stats(bake_stats(sine_fp32(1024, 1024), 0.5, 4, **kw),
                 **SINE_STATS)


def test_circle_serialize_roundtrip_config(circle):
    """The Serialize config reroutes the bake through
    serialize->deserialize->bake (test_omm_bake_cpu.cpp:211-348)."""
    tex = omm.Texture([circle], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex, dynamic_subdivision_scale=0.0,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
        unknown_state_promotion=omm.UnknownStatePromotion.Nearest,
        max_subdivision_level=4)
    blob = ser.serialize(ser.DeserializedDesc(input_descs=[desc]))
    d = ser.deserialize(blob)
    res = omm.bake(d.input_descs[0])
    expect_stats(omm.get_stats(res), **CIRCLE_STATS)

    # result roundtrip must be field-exact
    blob2 = ser.serialize(ser.DeserializedDesc(result_descs=[res],
                                               flags=ser.SerializeFlags.COMPRESS))
    back = ser.deserialize(blob2).result_descs[0]
    assert (back.array_data == res.array_data).all()
    assert back.desc_array == res.desc_array


def test_brute_force_near_duplicate(circle):
    """EnableNearDuplicateDetectionBruteForce path
    (bake_cpu_impl.cpp:1354-1430)."""
    tex = omm.Texture([circle[:128, :128]], omm.TextureFormat.FP32)
    # two slightly offset triangles -> similar but not identical states
    tc = np.array([[0.1, 0.1], [0.1, 0.9], [0.9, 0.5],
                   [0.101, 0.1], [0.101, 0.9], [0.901, 0.5]], np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.arange(6, dtype=np.uint32), index_count=6,
        dynamic_subdivision_scale=0.0, max_subdivision_level=4,
        bake_flags=(omm.BakeFlags.EnableNearDuplicateDetection
                    | omm.BakeFlags.EnableNearDuplicateDetectionBruteForce
                    | omm.BakeFlags.DisableSpecialIndices))
    res = omm.bake(desc)
    # merged: both primitives share one desc
    assert len(res.desc_array) == 1
    assert res.index_buffer[0] == res.index_buffer[1] == 0
