"""Unit tests for bird curve, morton codes, wrap modes, and state packing.

Golden values ported from the reference unit suites
(support/tests/test_texture.cpp, test_util.cpp) plus invariants from the
DX/VK micromap spec."""
import numpy as np
import pytest

from omm_tpu import bird, bit_tricks
from omm_tpu.texture import (TEXCOORD_BORDER, Texture, get_tex_coord)
from omm_tpu.types import TextureAddressMode as AM
from omm_tpu.types import TextureFormat, get_num_micro_triangles
from omm_tpu.bake import pack_states
from omm_tpu.stats import decode_states
from omm_tpu.types import Format


def _tc(mode, coord, size, expected):
    size = np.array(size, np.int32)
    log2 = np.array([bit_tricks.ctz(int(size[0])), bit_tricks.ctz(int(size[1]))],
                    np.int32)
    pow2 = bit_tricks.is_pow2(int(size[0])) and bit_tricks.is_pow2(int(size[1]))
    got = get_tex_coord(mode, np.array(coord, np.int32), size, log2, pow2)
    assert tuple(got) == tuple(expected), \
        f"{mode.name} {coord} {tuple(size)} -> {tuple(got)}, want {expected}"


def test_wrap():
    for coord, size, exp in [
        ((512, 512), (1024, 1024), (512, 512)),
        ((0, 512), (1024, 1024), (0, 512)),
        ((-1, -1), (1024, 1024), (1023, 1023)),
        ((-1024, -1), (1024, 1024), (0, 1023)),
        ((-2048, -1), (1024, 1024), (0, 1023)),
        ((1024, 1024), (1024, 1024), (0, 0)),
        ((2048, 1024), (1024, 1024), (0, 0)),
        ((512, 512), (512, 1024), (0, 512)),
        ((-1, -1), (512, 1024), (511, 1023)),
    ]:
        _tc(AM.Wrap, coord, size, exp)


def test_mirror():
    # test_texture.cpp:63-145
    exp_x = [0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 2, 1, 0, 0, 1, 2, 3,
             4, 5, 6, 7, 7, 6]
    for x in range(26):
        _tc(AM.Mirror, (x, 4), (8, 8), (exp_x[x], 4))
    exp_neg = [0, 0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 2, 1, 0, 0, 1, 2,
               3, 4, 5, 6, 7, 7]
    for x in range(26):
        _tc(AM.Mirror, (-x, 4), (8, 8), (exp_neg[x], 4))
    _tc(AM.Mirror, (8, 8), (8, 8), (7, 7))
    _tc(AM.Mirror, (16, 16), (8, 8), (0, 0))
    _tc(AM.Mirror, (32, 32), (8, 8), (0, 0))
    # non-pow2 size goes through the fp32 path
    _tc(AM.Mirror, (6, 0), (6, 6), (5, 0))
    _tc(AM.Mirror, (-1, 0), (6, 6), (0, 0))


def test_clamp():
    for coord, exp in [((512, 512), (512, 512)), ((-1, -1), (0, 0)),
                       ((-2048, -1), (0, 0)), ((1024, 1024), (1023, 1023)),
                       ((2048, 1024), (1023, 1023))]:
        _tc(AM.Clamp, coord, (1024, 1024), exp)


def test_border():
    B = TEXCOORD_BORDER
    for coord, exp in [((512, 512), (B, 512)), ((0, 512), (0, 512)),
                       ((-1, -1), (B, B)), ((0, -1), (0, B)),
                       ((1024, 1024), (B, B))]:
        _tc(AM.Border, coord, (512, 1024), exp)


def test_mirror_once():
    exp = [0, 1, 2, 3, 4, 5, 6, 7] + [7] * 18
    for x in range(26):
        _tc(AM.MirrorOnce, (x, 4), (8, 8), (exp[x], 4))
    # negative side mirrors once then clamps
    _tc(AM.MirrorOnce, (-1, 4), (8, 8), (0, 4))
    _tc(AM.MirrorOnce, (-8, 4), (8, 8), (7, 4))
    _tc(AM.MirrorOnce, (-25, 4), (8, 8), (7, 4))


def test_morton_roundtrip():
    # test_util.cpp:16-26 over a subsampled grid + roundtrip
    xs = np.arange(0, 1024, 7, dtype=np.uint32)
    X, Y = np.meshgrid(xs, xs)
    m = bit_tricks.xy_to_morton(X, Y)
    rx, ry = bit_tricks.morton_to_xy(m)
    assert (rx == X).all() and (ry == Y).all()


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4, 5])
def test_num_micro_triangles(level):
    assert get_num_micro_triangles(level) == 4 ** level


@pytest.mark.parametrize("level", [1, 2, 3, 5])
def test_bird_roundtrip(level):
    """index2dbary -> dbary2index must be the identity (bird.h:57-156)."""
    M = get_num_micro_triangles(level)
    idx = np.arange(M, dtype=np.uint32)
    u, v, w = bird.index2dbary(idx)
    mask = np.uint32((1 << level) - 1)
    got = bird.dbary2index(u & mask, v & mask, w & mask, level)
    assert (got == idx).all()


@pytest.mark.parametrize("level", [1, 2, 3, 4])
def test_bird_partition(level):
    """Micro-triangle corner UVs must exactly tile the unit triangle:
    total area 0.5, each 0.5/4^level."""
    M = get_num_micro_triangles(level)
    uv0, uv1, uv2 = bird.index2bary(np.arange(M, dtype=np.uint32), level)
    area = 0.5 * np.abs(
        (uv1[:, 0] - uv0[:, 0]) * (uv2[:, 1] - uv0[:, 1])
        - (uv1[:, 1] - uv0[:, 1]) * (uv2[:, 0] - uv0[:, 0]))
    np.testing.assert_allclose(area, 0.5 / M, rtol=1e-6)
    assert np.isclose(area.sum(), 0.5, rtol=1e-6)
    # all corners inside the unit triangle
    for uv in (uv0, uv1, uv2):
        assert (uv >= 0).all() and (uv.sum(axis=-1) <= 1 + 1e-6).all()


def test_bird_level0():
    uv0, uv1, uv2 = bird.index2bary(np.array([0], np.uint32), 0)
    assert tuple(uv0[0]) == (0, 0)
    assert tuple(uv1[0]) == (1, 0)
    assert tuple(uv2[0]) == (0, 1)


def test_bird_level1_known():
    """Level-1 bird order: center tri is index 1 (spec property: the
    inverted triangle of a level-1 subdivision sits at curve index 1)."""
    uv0, uv1, uv2 = bird.index2bary(np.arange(4, dtype=np.uint32), 1)
    tris = np.stack([uv0, uv1, uv2], axis=1)
    cents = tris.mean(axis=1)
    # index 1 is the central (inverted) micro-triangle
    np.testing.assert_allclose(cents[1], [1 / 3, 1 / 3], atol=1e-6)


@pytest.mark.parametrize("fmt", [Format.OC1_2_State, Format.OC1_4_State])
@pytest.mark.parametrize("level", [0, 1, 3])
def test_pack_decode_roundtrip(fmt, level):
    M = get_num_micro_triangles(level)
    rng = np.random.RandomState(7)
    hi = 2 if fmt == Format.OC1_2_State else 4
    states = rng.randint(0, hi, M).astype(np.uint8)
    packed = pack_states(states, fmt)
    got = decode_states(packed, 0, level, int(fmt))
    assert (got == states).all()


def test_sat_query():
    rng = np.random.RandomState(3)
    plane = rng.rand(17, 23).astype(np.float32)
    tex = Texture([plane], TextureFormat.FP32, alpha_cutoff=0.5)
    binar = (plane > 0.5).astype(np.int64)
    for _ in range(50):
        x0, x1 = sorted(rng.randint(0, 23, 2))
        y0, y1 = sorted(rng.randint(0, 17, 2))
        got = tex.sat_query(np.array([x0, y0]), np.array([x1, y1]), 0)
        want = binar[y0:y1 + 1, x0:x1 + 1].sum()
        assert int(got) == int(want)


# --- native host-stage fast paths (omm_native.cpp) ----------------------

def test_native_states3_digest_matches_materialized():
    """states3_digest fuses the UT->UO remap into XXH64; it must equal
    the hash of the materialized 3-state view (the exact-dedup key,
    bake_cpu_impl.cpp:1031-1066)."""
    from omm_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(11)
    for n in (1, 4, 16, 31, 32, 33, 100, 4096, 262144):
        st = rng.randint(0, 4, n).astype(np.uint8)
        s3 = np.where(st == 2, np.uint8(3), st)
        assert native.states3_digest(st) == native.xxh64(s3.tobytes(),
                                                         seed=0)


def test_native_pack_matches_fallback_and_into():
    """The u64-folded native pack must bit-match the numpy fallback, and
    pack_states_into must write the same bytes into a provided view."""
    import omm_tpu.native as nm
    from omm_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(13)
    for bits in (1, 2):
        for n in (1, 4, 16, 64, 256, 4096, 16384):
            st = rng.randint(0, 4, n).astype(np.uint8)
            got = native.pack_states(st, bits)
            real = nm._LIB
            nm._LIB = None
            try:
                want = native.pack_states(st, bits)
            finally:
                nm._LIB = real
            assert (got == want).all(), (bits, n)
            out = np.zeros(len(want), np.uint8)
            assert native.pack_states_into(st, bits, out)
            assert (out == want).all(), (bits, n)


def test_native_all_uniform():
    from omm_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    assert native.all_uniform_u8(np.full(4 ** 5, 3, np.uint8)) == 3
    assert native.all_uniform_u8(np.full(5, 1, np.uint8)) == 1
    a = np.full(4 ** 5, 2, np.uint8)
    a[-1] = 0
    assert native.all_uniform_u8(a) == -1
    a = np.zeros(9, np.uint8)
    a[8] = 1  # differs only in the sub-word tail
    assert native.all_uniform_u8(a) == -1
    assert native.all_uniform_u8(np.zeros(0, np.uint8)) == -1


def test_native_pack_states_batch_matches_per_item():
    """The one-call batched blob pack must byte-match per-item
    pack_states at every offset, across mixed bit widths and levels."""
    from omm_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(23)
    arrs = [rng.randint(0, 4, 4 ** k).astype(np.uint8)
            for k in (1, 3, 4, 5, 5, 2)]
    bits = [2, 1, 2, 1, 2, 2]
    offs, o = [], 0
    for a, b in zip(arrs, bits):
        offs.append(o)
        o += max(len(a) * b >> 3, 1)
    out = np.zeros(o, np.uint8)
    assert native.pack_states_batch(arrs, bits, offs, out)
    want = np.zeros(o, np.uint8)
    for a, b, off in zip(arrs, bits, offs):
        p = native.pack_states(a, b)
        want[off:off + len(p)] = p
    assert (out == want).all()


def test_native_row_post_matches_per_row():
    """row_post (the fused digest+uniform pass over a reconstructed
    state block) must agree with per-row states3_digest/all_uniform_u8 —
    the bake tail's dedup and promotion reuse its results."""
    from omm_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(17)
    for rows, M in ((1, 64), (5, 1024), (3, 4 ** 6)):
        blk = rng.randint(0, 4, size=(rows, M)).astype(np.uint8)
        blk[rows // 2, :] = 3  # a uniform row
        dp = native.row_post(blk)
        assert dp is not None
        dig, uni = dp
        for r in range(rows):
            assert int(dig[r]) == native.states3_digest(blk[r]), (rows, r)
            assert int(uni[r]) == native.all_uniform_u8(blk[r]), (rows, r)


def test_workitem_post_cache_invalidation():
    """WorkItem.post (the classify engine's fused digest/uniform) must
    clear on ANY states reassignment — merges and downsampling build new
    arrays, so attribute assignment is the invalidation point."""
    from omm_tpu.bake import WorkItem, _merge_work_items
    from omm_tpu.types import Format
    tri = np.zeros((3, 2), np.float32)
    a = WorkItem(subdivision_level=2, vm_format=Format.OC1_4_State,
                 uv_tri=tri, primitive_indices=[0])
    b = WorkItem(subdivision_level=2, vm_format=Format.OC1_4_State,
                 uv_tri=tri, primitive_indices=[1])
    assert a._fresh and a.post is None
    # fresh items are frozen: an in-place write would invalidate _fresh
    # silently, so it must raise instead
    with pytest.raises(ValueError):
        a.states[0] = 1
    a.post = (123, -1)
    b.post = (456, -1)
    # while the post cache is live, states stays frozen too
    with pytest.raises(ValueError):
        a.states[0] = 1
    st = a.states.copy()
    st[0] = 1
    a.states = st  # reassignment is the sanctioned mutation path
    assert a.post is None and not a._fresh
    a.states[0] = 2  # and the new array is writable until a cache lands
    a.post = (123, -1)
    b.states = np.zeros(16, np.uint8)
    _merge_work_items(a, b)
    assert a.post is None  # states reassigned by the merge
    assert not a._fresh
    # explicitly-passed states are never "fresh"
    c = WorkItem(subdivision_level=2, vm_format=Format.OC1_4_State,
                 uv_tri=tri, primitive_indices=[2],
                 states=np.zeros(16, np.uint8))
    assert not c._fresh


def test_split_tail_light():
    from omm_tpu.bake import split_tail_light
    seq = list(range(256))
    got = split_tail_light(seq, [128, 96, 32])
    assert [len(c) for c in got] == [128, 96, 32]
    assert sum(got, []) == seq
    assert [len(c) for c in split_tail_light(list(range(512)),
                                             [128, 96, 32])] \
        == [128, 128, 128, 96, 32]
    # remainders smaller than the schedule still cover everything
    for n in (1, 31, 130, 200, 255, 300):
        chunks = split_tail_light(list(range(n)), [128, 96, 32])
        assert sum(chunks, []) == list(range(n))
    # plain fixed size
    assert [len(c) for c in split_tail_light(list(range(300)), [128])] \
        == [128, 128, 44]
