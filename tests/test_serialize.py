"""Serialization: golden-blob compat with the reference SDK + roundtrips.

Golden blobs in tests/data/ were produced by reference SDK versions
1.4.0-1.7.0 (embedded in test_omm_bake_cpu.cpp:2034-2304); expected stats
come from the same tests.  All goldens encode the StandardCircle 8x8 bake
at subdivision level 4.
"""
import os

import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import serialize as ser
from omm_tpu.serialize import DeserializedDesc, SerializeFlags

from fixtures import standard_circle, expect_stats

DATA = os.path.join(os.path.dirname(__file__), "data")

GOLDEN_STATS = dict(total_opaque=152, total_transparent=232,
                    total_unknown_transparent=70, total_unknown_opaque=58)


def _load(name):
    with open(os.path.join(DATA, name + ".bin"), "rb") as f:
        return f.read()


def _bake_desc():
    """The GenerateSerializedString workload: StandardCircle 8x8, level 4
    (test_omm_bake_cpu.cpp:748-777)."""
    tex = omm.Texture([standard_circle(8, 8)], omm.TextureFormat.FP32)
    return omm.BakeInputDesc(
        texture=tex,
        bake_flags=omm.BakeFlags.EnableInternalThreads,
        runtime_sampler=omm.SamplerDesc(
            addressing_mode=omm.TextureAddressMode.Clamp,
            filter=omm.TextureFilterMode.Linear),
        alpha_mode=omm.AlphaMode.Test,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32),
        index_count=6,
        alpha_cutoff=0.5,
        dynamic_subdivision_scale=0.0,
        unknown_state_promotion=omm.UnknownStatePromotion.Nearest,
        max_subdivision_level=4)


@pytest.mark.parametrize("name", [
    "input_v1_4_0", "input_v1_5_0", "input_compress_v1_5_0"])
def test_deserialize_golden_input_and_bake(name):
    d = ser.deserialize(_load(name))
    assert len(d.input_descs) == 1 and len(d.result_descs) == 0
    res = omm.bake(d.input_descs[0])
    expect_stats(omm.get_stats(res), **GOLDEN_STATS)


@pytest.mark.parametrize("name", [
    "output_v1_4_0", "output_compress_v1_4_0", "output_v1_5_0",
    "output_compress_v1_5_0", "output_compress_v1_6_0",
    "output_compress_v1_7_0"])
def test_deserialize_golden_output(name):
    d = ser.deserialize(_load(name))
    assert len(d.result_descs) == 1
    expect_stats(omm.collect_stats(d.result_descs[0]), **GOLDEN_STATS)


def test_corrupted_blob_rejected():
    blob = _load("input_v1_5_0")[:-4]
    with pytest.raises(omm.BakeError) as ei:
        ser.deserialize(blob)
    assert ei.value.result == omm.Result.INVALID_ARGUMENT


@pytest.mark.parametrize("compress", [False, True])
def test_input_roundtrip_bake(compress):
    desc = _bake_desc()
    flags = SerializeFlags.COMPRESS if compress else SerializeFlags.NONE
    blob = ser.serialize(DeserializedDesc(flags=flags, input_descs=[desc]))
    d = ser.deserialize(blob)
    assert len(d.input_descs) == 1
    res = omm.bake(d.input_descs[0])
    expect_stats(omm.get_stats(res), **GOLDEN_STATS)


def test_input_strided_texcoords_quirk_bytes():
    """Quirk parity with serialize_impl.cpp:98-104: the texcoord payload is
    the FIRST elementSize*(maxIndex+1) bytes of the user buffer, stride
    ignored — a stride-16 interleaved buffer serializes its raw leading
    bytes (padding included, tail truncated), byte-identical to the
    dense-stride blob of the same leading bytes."""
    tex = omm.Texture([standard_circle(8, 8)], omm.TextureFormat.FP32)
    uv32 = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32)
    inter = np.zeros((4, 4), np.float32)  # stride 16: UV + 8 pad bytes
    inter[:, 0:2] = uv32
    raw = inter.reshape(-1).view(np.uint8)

    def mk(tc, stride):
        return omm.BakeInputDesc(
            texture=tex, tex_coords=tc, tex_coord_stride_in_bytes=stride,
            tex_coord_format=omm.TexCoordFormat.UV32_FLOAT,
            index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32),
            index_count=6, dynamic_subdivision_scale=0.0,
            max_subdivision_level=4)

    blob = ser.serialize(DeserializedDesc(input_descs=[mk(raw, 16)]))
    # same leading 8*(maxIndex+1)=32 bytes presented densely
    dense = raw[:32].copy()
    blob_dense = ser.serialize(DeserializedDesc(input_descs=[mk(dense, 0)]))
    # the blobs differ ONLY in the stored texCoordStrideInBytes field
    # (plus the leading 8-byte XXH64 digest that covers it)
    assert len(blob) == len(blob_dense)
    diff = np.flatnonzero(np.frombuffer(blob, np.uint8)
                          != np.frombuffer(blob_dense, np.uint8))
    assert list(diff[:8]) == list(range(8)) and len(diff) == 9

    # round-trip preserves the stride field and the quirk payload
    d = ser.deserialize(blob)
    back = d.input_descs[0]
    assert back.tex_coord_stride_in_bytes == 16
    assert np.asarray(back.tex_coords).view(np.uint8).tobytes() \
        == raw[:32].tobytes()


@pytest.mark.parametrize("compress", [False, True])
def test_result_roundtrip_bytes(compress):
    """Serialize -> deserialize of a result must be field-exact
    (test_omm_bake_cpu.cpp:304-347)."""
    res = omm.bake(_bake_desc())
    flags = SerializeFlags.COMPRESS if compress else SerializeFlags.NONE
    blob = ser.serialize(DeserializedDesc(flags=flags, result_descs=[res]))
    d = ser.deserialize(blob)
    got = d.result_descs[0]
    assert (got.array_data == res.array_data).all()
    assert got.desc_array == res.desc_array
    assert got.desc_array_histogram == res.desc_array_histogram
    assert got.index_format == res.index_format
    assert (got.packed_index_buffer() == res.packed_index_buffer()).all()
    assert got.index_histogram == res.index_histogram


def test_serialized_result_matches_golden_bytes():
    """Our V5 result blob must be byte-identical to the reference 1.7.0+
    output (same format version, same content) apart from compression;
    compare against output_v1_5_0 content by re-serializing uncompressed
    with the reference's payload layout."""
    res = omm.bake(_bake_desc())
    blob = ser.serialize(DeserializedDesc(result_descs=[res]))
    golden = _load("output_v1_5_0")
    # Headers differ (SDK version triple); payloads must match exactly.
    assert blob[32:] == golden[32:]


def test_texture_morton_roundtrip():
    rng = np.random.RandomState(5)
    plane = rng.rand(13, 29).astype(np.float32)  # non-pow2, non-square
    tex = omm.Texture([plane], omm.TextureFormat.FP32, alpha_cutoff=0.5)
    desc = _bake_desc()
    desc.texture = tex
    blob = ser.serialize(DeserializedDesc(input_descs=[desc]))
    d = ser.deserialize(blob)
    tex2 = d.input_descs[0].texture
    assert (tex2.mips[0] == plane).all()
    assert tex2.has_sat()
    assert (tex2.sat[0] == tex.sat[0]).all()


def test_roundtrip_with_subdivision_levels():
    """Input descs carrying a per-triangle subdivision-level buffer must
    round-trip: the blob format's numSubdivLvls is indexCount
    (serialize_impl.cpp:147-151), padded with 13 = use-global
    (omm.h:445-448)."""
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    tc = np.array([[0.05, 0.5], [0.5, 0.05], [0.5, 0.5], [0.95, 0.5],
                   [0.5, 0.95]], np.float32)
    ib = np.array([0, 1, 2, 1, 3, 2, 3, 4, 2, 2, 4, 0], np.uint32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc, index_buffer=ib, index_count=12,
        subdivision_levels=np.array([2, 3, 4, 5], np.uint8),
        max_subdivision_level=5, dynamic_subdivision_scale=0.0)
    res = omm.bake(desc)
    blob = ser.serialize(ser.DeserializedDesc(
        flags=ser.SerializeFlags.COMPRESS,
        input_descs=[desc], result_descs=[res]))
    back = ser.deserialize(blob)
    assert len(back.input_descs) == 1 and len(back.result_descs) == 1
    sl = np.asarray(back.input_descs[0].subdivision_levels)
    assert sl.shape == (12,)
    assert np.array_equal(sl[:4], [2, 3, 4, 5])
    assert (sl[4:] == 13).all()  # use-global sentinel padding
    res2 = omm.bake(back.input_descs[0])
    assert np.array_equal(res2.array_data, res.array_data)
    assert np.array_equal(back.result_descs[0].array_data, res.array_data)


def test_roundtrip_fuzz_desc_matrix():
    """Randomized serialize->deserialize->re-bake property test over the
    input-desc option space (mips, UNORM8, embedded cutoff, per-triangle
    formats and subdivision levels, texcoord formats, compression):
    every blob must parse back field-faithfully and re-bake identically."""
    rng = np.random.RandomState(99)
    for trial in range(12):
        n = 32
        plane = (rng.rand(n, n) > 0.5).astype(np.float32)
        unorm8 = bool(rng.randint(2))
        mips = [plane]
        if rng.randint(2):
            mips.append(plane[::2, ::2].copy())
        if unorm8:
            mips = [(m * np.float32(255)).astype(np.uint8) for m in mips]
        embed = bool(rng.randint(2))
        tex = omm.Texture(
            mips,
            omm.TextureFormat.UNORM8 if unorm8 else omm.TextureFormat.FP32,
            alpha_cutoff=0.5 if embed and len(mips) == 1 else -1.0)

        tri_count = int(rng.randint(1, 5))
        tc = rng.rand(3 * tri_count, 2).astype(np.float32)
        ib = np.arange(3 * tri_count, dtype=np.uint32)
        desc = omm.BakeInputDesc(
            texture=tex, tex_coords=tc, index_buffer=ib,
            index_count=3 * tri_count,
            max_subdivision_level=int(rng.randint(1, 4)),
            dynamic_subdivision_scale=0.0)
        if rng.randint(2):
            desc.subdivision_levels = rng.randint(
                0, 4, tri_count).astype(np.uint8)
        if rng.randint(2):
            desc.formats = np.full(tri_count,
                                   int(omm.Format.OC1_4_State), np.int32)
        res = omm.bake(desc)

        flags = ser.SerializeFlags.COMPRESS if rng.randint(2) \
            else ser.SerializeFlags.NONE
        blob = ser.serialize(ser.DeserializedDesc(
            flags=flags, input_descs=[desc], result_descs=[res]))
        back = ser.deserialize(blob)
        assert len(back.input_descs) == 1, trial
        assert len(back.result_descs) == 1, trial
        assert np.array_equal(back.result_descs[0].array_data,
                              res.array_data), trial
        res2 = omm.bake(back.input_descs[0])
        assert np.array_equal(res2.array_data, res.array_data), trial
