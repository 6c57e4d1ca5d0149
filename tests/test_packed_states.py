"""Packed-direct replay path: the device engine returns serialize-ready
sequential 2-bit rows (kernels/twophase.PackedStates) and the bake
consumes them without materializing the unpacked arrays.

Reference semantics covered: the blob bytes must equal the per-item
OC1_4_State pack of the classified states (bake_cpu_impl.cpp:1802-1819)
and the exact-dedup digest must equal the 3-state XXH64 of the unpacked
array (bake_cpu_impl.cpp:1031-1066).
"""
import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import engine, native
from omm_tpu.bake import WorkItem
from omm_tpu.kernels import twophase as tp
from omm_tpu.types import Format, get_num_micro_triangles

from fixtures import standard_circle


SUBDIV = 6


def _cfg():
    return engine.ResampleConfig(
        addr_mode=omm.TextureAddressMode.Clamp,
        filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
        border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)


def _tris(n, seed=3):
    rng = np.random.RandomState(seed)
    return [np.sort(rng.rand(3, 2).astype(np.float32) * 0.8 + 0.1, axis=0)
            for _ in range(n)]


@pytest.fixture(scope="module")
def tex():
    return omm.Texture([standard_circle(256, 256)], omm.TextureFormat.FP32)


def test_packed_out_matches_oracle_and_digest(tex):
    cfg = _cfg()
    tris = _tris(16)
    M = get_num_micro_triangles(SUBDIV)
    batch = [[(t, None) for t in tris]]
    tp.classify_work_items_batches(tex, cfg, batch, SUBDIV)  # warm caps
    posts = []
    outs = tp.classify_work_items_batches(
        tex, cfg, batch, SUBDIV, post_out=posts, packed_out=True)[0]
    assert any(isinstance(s, tp.PackedStates) for s in outs), \
        "speculative packed path never ran"
    for k, s in enumerate(outs):
        arr = s.unpack() if isinstance(s, tp.PackedStates) else s
        want = engine.resample_fine_item(tex, cfg, tris[k], SUBDIV,
                                         np.full(M, 3, np.uint8))
        assert (arr == want).all(), f"tri {k}"
        if isinstance(s, tp.PackedStates):
            dig, uni = posts[0][k]
            assert dig == native.states3_digest(arr)
            u = native.all_uniform_u8(arr)
            if u is not None:
                assert uni == u


def test_workitem_lazy_materialization(tex):
    cfg = _cfg()
    tris = _tris(4, seed=11)
    M = get_num_micro_triangles(SUBDIV)
    batch = [[(t, None) for t in tris]]
    tp.classify_work_items_batches(tex, cfg, batch, SUBDIV)
    posts = []
    outs = tp.classify_work_items_batches(
        tex, cfg, batch, SUBDIV, post_out=posts, packed_out=True)[0]
    s = next(x for x in outs if isinstance(x, tp.PackedStates))
    it = WorkItem(subdivision_level=SUBDIV, vm_format=Format.OC1_4_State,
                  uv_tri=tris[0], primitive_indices=[0])
    it.set_packed_states(s, (1, -1))
    assert it.packed2() is s and it.post == (1, -1)
    arr = it.states                      # materializes (frozen)
    assert arr.shape == (M,) and not arr.flags.writeable
    assert (arr == s.unpack()).all()
    assert it.packed2() is s             # still valid: no reassignment
    it.states = arr.copy()               # reassignment invalidates both
    assert it.packed2() is None and it.post is None


def test_bake_packed_blob_equals_numpy(tex):
    tris = _tris(24, seed=7)
    tc = np.concatenate(tris).astype(np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.arange(3 * len(tris), dtype=np.uint32),
        index_count=3 * len(tris), max_subdivision_level=SUBDIV)
    rn = omm.bake(desc)
    omm.bake(desc, backend="pallas")     # cold caps: sync path
    rp = omm.bake(desc, backend="pallas")  # warm caps: packed path
    assert bytes(rn.array_data) == bytes(rp.array_data)
    assert rn.desc_array == rp.desc_array
    assert (rn.index_buffer == rp.index_buffer).all()
    assert rn.desc_array_histogram == rp.desc_array_histogram
    assert rn.index_histogram == rp.index_histogram


def test_multilevel_single_call_matches_oracle(tex):
    """One pipelined call classifying batches of DIFFERENT subdivision
    levels (the mixed-level mesh path: every level's chains enqueue
    before any fetch drains) is per-item identical to the oracle."""
    cfg = _cfg()
    tris = _tris(12, seed=23)
    batches = [[(t, None) for t in tris[:4]],
               [(t, None) for t in tris[4:8]],
               [(t, None) for t in tris[8:]]]
    levels = [6, 5, 4]
    # warm each level's caps, then the pipelined multilevel call
    for b, lv in zip(batches, levels):
        tp.classify_work_items_batches(tex, cfg, [b], lv)
    outs = tp.classify_work_items_batches(tex, cfg, batches, levels,
                                          packed_out=True)
    for b, lv, res in zip(batches, levels, outs):
        M = get_num_micro_triangles(lv)
        for (t, _), s in zip(b, res):
            arr = s.unpack() if isinstance(s, tp.PackedStates) else s
            want = engine.resample_fine_item(tex, cfg, t, lv,
                                             np.full(M, 3, np.uint8))
            assert (arr == want).all()


def test_native_packed_replay_parity():
    """reconstruct_packed rows unpack to reconstruct_states bytes and
    row_post_packed digests equal row_post over the unpacked block, for
    several descent shapes."""
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    for (T, subdiv, levels, Cs, Cs_cap, K, K_cap, gt, le) in [
            (8, 4, [2, 4], [300, 900], [512, 1024], 700, 1024, 0, 1),
            (16, 6, [2, 4, 6], [500, 3000], [512, 4096], 3000, 4096, 0, 1),
            (3, 2, [1, 2], [10], [16], 12, 64, 2, 1)]:
        m = len(levels) - 1
        N0 = 4 ** levels[0]
        sizes = [T * N0] + [Cs_cap[i] * 4 ** (levels[i + 1] - levels[i])
                            for i in range(m)]
        total = sum(s // 4 for s in sizes) + K_cap // 4
        hdr = 4 * (m + 2 + 1)
        vals = rng.choice([0, 1, 2], size=4 * total,
                          p=[0.44, 0.12, 0.44]).astype(np.uint8)
        packed = (vals[0::4] | (vals[1::4] << 2) | (vals[2::4] << 4)
                  | (vals[3::4] << 6))
        buf = np.concatenate([np.zeros(hdr, np.uint8), packed])
        M = 4 ** subdiv
        rec = native.reconstruct_states(buf, hdr, levels, T, subdiv, Cs,
                                        Cs_cap, K, K_cap, gt, le, None)
        pk = native.reconstruct_packed(buf, hdr, levels, T, subdiv, Cs,
                                       Cs_cap, K, K_cap, gt, le)
        unp = np.stack([native.unpack_2bit_seq(pk[t], M)
                        for t in range(T)])
        assert (unp == rec).all()
        dp = native.row_post_packed(pk, M)
        dr = native.row_post(rec)
        assert (dp[0] == dr[0]).all() and (dp[1] == dr[1]).all()

def test_native_packed_replay_row_base_parity():
    """reconstruct_packed with a row_base sink writes byte-identical
    rows at the given offsets (the speculative-serialize layout), and
    row_post_packed over the scattered rows matches the contiguous
    form."""
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(1)
    for (T, subdiv, levels, Cs, Cs_cap, K, K_cap, gt, le) in [
            (8, 4, [2, 4], [300, 900], [512, 1024], 700, 1024, 0, 1),
            (5, 3, [3], [], [], 0, 64, 0, 1),       # levels[0] == subdiv
            (16, 6, [2, 4, 6], [500, 3000], [512, 4096], 3000, 4096,
             0, 1)]:
        m = len(levels) - 1
        N0 = 4 ** levels[0]
        sizes = [T * N0] + [Cs_cap[i] * 4 ** (levels[i + 1] - levels[i])
                            for i in range(m)]
        total = sum(s // 4 for s in sizes) + max(K_cap // 4, 1)
        hdr = 4 * (m + 2 + 1)
        vals = rng.choice([0, 1, 2], size=4 * total,
                          p=[0.44, 0.12, 0.44]).astype(np.uint8)
        packed = (vals[0::4] | (vals[1::4] << 2) | (vals[2::4] << 4)
                  | (vals[3::4] << 6))
        buf = np.concatenate([np.zeros(hdr, np.uint8), packed])
        M = 4 ** subdiv
        Q = M >> 2
        pk = native.reconstruct_packed(buf, hdr, levels, T, subdiv, Cs,
                                       Cs_cap, K, K_cap, gt, le)
        # scattered, permuted row offsets with gaps
        perm = rng.permutation(T)
        rb = np.asarray([int(perm[t]) * (Q + 8) + 4 for t in range(T)],
                        np.int64)
        blob = np.zeros(T * (Q + 8) + 16, np.uint8)
        ok = native.reconstruct_packed(buf, hdr, levels, T, subdiv, Cs,
                                       Cs_cap, K, K_cap, gt, le,
                                       row_base=rb, out=blob)
        assert ok is True
        for t in range(T):
            assert (blob[rb[t]:rb[t] + Q] == pk[t]).all(), f"row {t}"
        dp = native.row_post_packed(pk, M)
        ds = native.row_post_packed(blob, M, row_base=rb)
        assert (dp[0] == ds[0]).all() and (dp[1] == ds[1]).all()


def test_bake_speculative_serialize_hit(tex):
    """Unique mixed triangles: the speculative layout holds, the replay
    writes rows straight into the final blob (items carry in-blob
    PackedStates), and the result is byte-identical to the oracle."""
    import omm_tpu.bake
    import sys as _sys
    B = _sys.modules["omm_tpu.bake"]  # omm_tpu.bake names the function
    from omm_tpu.log import Logger
    # every triangle straddles the circle's alpha contour (r=0.4 around
    # (0.5,0.5)): one vertex inside, two outside -> mixed states, so no
    # item gets a special index; per-k radii/widths make the shapes
    # non-congruent so exact dedup can't merge any (congruent rotations
    # of a binary-alpha contour DO produce byte-identical states)
    tris = []
    for k in range(12):
        a = 2 * np.pi * k / 12 + 0.13
        ri = 0.14 + 0.008 * k
        ro = 0.52 + 0.006 * k
        w = 0.12 + 0.011 * k
        inner = (0.5 + ri * np.cos(a), 0.5 + ri * np.sin(a))
        o1 = (0.5 + ro * np.cos(a - w), 0.5 + ro * np.sin(a - w))
        o2 = (0.5 + ro * np.cos(a + w), 0.5 + ro * np.sin(a + w))
        tris.append(np.asarray([inner, o1, o2], np.float32))
    tc = np.concatenate(tris).astype(np.float32)
    # DisableSpecialIndices + DisableDuplicateDetection pin the layout:
    # no promotion or merge can move an item, so the speculation MUST
    # hold (nearly-congruent contour triangles otherwise dedup at
    # coarse levels, a legitimate miss)
    flags = (omm.BakeFlags.DisableSpecialIndices
             | omm.BakeFlags.DisableDuplicateDetection)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.arange(3 * len(tris), dtype=np.uint32),
        index_count=3 * len(tris), max_subdivision_level=SUBDIV,
        bake_flags=flags)
    omm.bake(desc, backend="pallas")     # cold caps: sync path
    opts = B.Options.from_flags(desc.bake_flags)
    items = B.setup_work_items(desc, opts, Logger())
    spec = B._speculative_blob_plan(desc, opts, items, None)
    assert spec is not None
    B.classify_items(desc, opts, items, backend="pallas", spec_blob=spec)
    inblob = [it for it in items if it.packed2() is not None
              and it.packed2().blob_offset is not None]
    assert inblob, "speculative sink never engaged"
    res = B.finalize_items(desc, opts, items, spec_blob=spec)
    assert np.shares_memory(res.array_data, spec), \
        "validated speculation should reuse the blob"
    rn = omm.bake(desc)
    assert bytes(np.asarray(rn.array_data)) == bytes(
        np.asarray(res.array_data))
    assert (rn.index_buffer == res.index_buffer).all()
    assert rn.desc_array == res.desc_array


def test_bake_speculative_serialize_miss_falls_back(tex):
    """Uniform + duplicate triangles promote/merge, invalidating the
    speculative layout: serialize must fall back to the copy path and
    still produce oracle-identical bytes."""
    tc = np.array([[0.92, 0.92], [0.94, 0.92], [0.92, 0.94],  # uniform T
                   [0.50, 0.50], [0.52, 0.50], [0.50, 0.52],  # uniform O
                   [0.30, 0.30], [0.60, 0.30], [0.30, 0.60],  # mixed
                   [0.30, 0.30], [0.60, 0.30], [0.30, 0.60],  # duplicate
                   [0.20, 0.55], [0.55, 0.20], [0.58, 0.58]], # mixed
                  np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.arange(15, dtype=np.uint32), index_count=15,
        max_subdivision_level=SUBDIV)
    rn = omm.bake(desc)
    omm.bake(desc, backend="pallas")
    rp = omm.bake(desc, backend="pallas")
    assert bytes(np.asarray(rn.array_data)) == bytes(
        np.asarray(rp.array_data))
    assert (rn.index_buffer == rp.index_buffer).all()
    assert rn.desc_array == rp.desc_array
    # the miss really happened: specials/dedup must exist in this bake
    assert any(i < 0 for i in np.asarray(rn.index_buffer))


def _skip_ref_replay(buf, hdr, levels, T, subdiv, Cs, Cs_cap, K, K_cap,
                     gt, le):
    """In-test reference for the skip-final payload: replay levels
    0..m-1 normally, then map the finals stream 1:1 over the children of
    the last mid-level's unresolved nodes (scan order)."""
    m = len(levels) - 1
    M = 4 ** subdiv
    N0 = 4 ** levels[0]
    sizes = [T * N0] + [Cs_cap[i] * 4 ** (levels[i + 1] - levels[i])
                        for i in range(m - 1)]
    sides, o = [], hdr
    for s in sizes:
        sides.append(tp._unpack2_seq(buf[o:o + s // 4]).astype(np.int8)
                     - 1)
        o += s // 4
    finals = tp._unpack2_seq(buf[o:o + K_cap // 4])
    smap = {1: np.uint8(gt), -1: np.uint8(le), 0: np.uint8(0)}

    def map_side(s):
        return np.where(s == 1, np.uint8(gt),
                        np.where(s == -1, np.uint8(le), np.uint8(0)))

    base = np.repeat(map_side(sides[0]), M // N0)
    unres = sides[0] == 0
    node_t = np.repeat(np.arange(T, dtype=np.int64), N0)
    node_n = np.tile(np.arange(N0, dtype=np.int64), T)
    for i in range(1, m + 1):
        E = 4 ** (levels[i] - levels[i - 1])
        Ci = min(int(Cs[i - 1]), Cs_cap[i - 1])
        cand = np.flatnonzero(unres)[:Ci]
        Ci = cand.shape[0]
        node_t = np.repeat(node_t[cand], E)
        node_n = (np.repeat(node_n[cand] * E, E)
                  + np.tile(np.arange(E, dtype=np.int64), Ci))
        if i == m:
            break
        side_i = sides[i][:Ci * E]
        span = M // (4 ** levels[i])
        base.reshape(T * 4 ** levels[i], span)[
            node_t * (4 ** levels[i]) + node_n] = \
            map_side(side_i)[:, None]
        unres = side_i == 0
    sids = node_t * M + node_n
    n = min(int(K), sids.shape[0])
    base[sids[:n]] = finals[:n]
    return base.reshape(T, M)


def test_native_skip_final_replay_parity():
    """skip_final payloads (no final side stream, finals 1:1 over the
    last mid-level's unresolved children) reconstruct identically across
    the native packed, native unpacked, and reference replays, with and
    without a row_base sink."""
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(7)
    for (T, subdiv, levels, Cs, Cs_cap, K_cap, gt, le) in [
            (8, 4, [2, 3, 4], [300, 700], [512, 1024], 4096, 0, 1),
            (16, 6, [2, 4, 5, 6], [500, 2000, 3000],
             [512, 2048, 4096], 16384, 0, 1),
            (3, 3, [2, 3], [30], [64], 256, 2, 1)]:
        m = len(levels) - 1
        assert levels[-1] - levels[-2] == 1
        N0 = 4 ** levels[0]
        sizes = [T * N0] + [Cs_cap[i] * 4 ** (levels[i + 1] - levels[i])
                            for i in range(m - 1)]
        total = sum(s // 4 for s in sizes) + K_cap // 4
        hdr = 4 * (m + 2 + 1)
        vals = rng.choice([0, 1, 2], size=4 * total,
                          p=[0.44, 0.12, 0.44]).astype(np.uint8)
        packed = (vals[0::4] | (vals[1::4] << 2) | (vals[2::4] << 4)
                  | (vals[3::4] << 6))
        buf = np.concatenate([np.zeros(hdr, np.uint8), packed])
        # K = true child count of the last mid-level's unresolved nodes
        # (what the device reports when the final window test is skipped)
        want = None
        M = 4 ** subdiv
        K = K_cap  # upper bound; reference clamps by child count
        want = _skip_ref_replay(buf, hdr, levels, T, subdiv, Cs, Cs_cap,
                                K, K_cap, gt, le)
        rec = native.reconstruct_states(buf, hdr, levels, T, subdiv, Cs,
                                        Cs_cap, K, K_cap, gt, le, None,
                                        skip_final=True)
        assert (rec == want).all()
        pk = native.reconstruct_packed(buf, hdr, levels, T, subdiv, Cs,
                                       Cs_cap, K, K_cap, gt, le,
                                       skip_final=True)
        unp = np.stack([native.unpack_2bit_seq(pk[t], M)
                        for t in range(T)])
        assert (unp == rec).all()
        # row_base sink parity
        Q = M >> 2
        perm = rng.permutation(T)
        rb = np.asarray([int(perm[t]) * (Q + 8) + 4 for t in range(T)],
                        np.int64)
        blob = np.zeros(T * (Q + 8) + 16, np.uint8)
        ok = native.reconstruct_packed(buf, hdr, levels, T, subdiv, Cs,
                                       Cs_cap, K, K_cap, gt, le,
                                       row_base=rb, out=blob,
                                       skip_final=True)
        assert ok is True
        for t in range(T):
            assert (blob[rb[t]:rb[t] + Q] == pk[t]).all(), f"row {t}"


def test_skip_final_pipeline_matches_oracle_and_nonskip(tex,
                                                        monkeypatch):
    """A workload whose descent ends in a step-1 level rides the
    skip-final path; its states must equal the oracle AND the numpy
    fallback replay (native disabled) must agree byte-for-byte."""
    cfg = _cfg()
    tris = _tris(6, seed=11)
    # force a step-1 tail (the driver workload's subdiv-9 shape has one
    # naturally; subdiv 6 here needs the schedule knob)
    monkeypatch.setenv("OMM_TP_TAIL_STEP1", "1")
    lg = tp._group_level(tex, tris, SUBDIV)
    levels = tp._descend_levels(tex, tris, SUBDIV, lg)
    assert tp._skip_final_p(levels, True), levels
    M = get_num_micro_triangles(SUBDIV)
    batch = [[(t, None) for t in tris]]
    tp.classify_work_items_batches(tex, cfg, batch, SUBDIV)  # warm caps
    outs = tp.classify_work_items_batches(tex, cfg, batch, SUBDIV)[0]
    for k, st in enumerate(outs):
        arr = st.unpack() if isinstance(st, tp.PackedStates) else st
        want = engine.resample_fine_item(tex, cfg, tris[k], SUBDIV,
                                         np.full(M, 3, np.uint8))
        assert (arr == want).all(), f"tri {k}"
    # numpy-fallback replay (native off) must match too
    monkeypatch.setattr(native, "get_lib", lambda: None)
    outs2 = tp.classify_work_items_batches(tex, cfg, batch, SUBDIV)[0]
    for a, b in zip(outs, outs2):
        aa = a.unpack() if isinstance(a, tp.PackedStates) else a
        bb = b.unpack() if isinstance(b, tp.PackedStates) else b
        assert (aa == bb).all()
