"""ctypes loader for the native runtime library (LZ4 + XXH64).

Compiles omm_native.cpp with g++ on first use and caches the .so next to
the source.  Falls back to None if no compiler is available; callers must
handle the absence (serialization then raises on compressed blobs).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "omm_native.cpp")
_SO = os.path.join(_DIR, "libomm_native.so")


def _build() -> bool:
    # -march=native lets the pack/digest/replay SWAR loops auto-vectorize
    # for the build host (the .so is built on first use, never shipped);
    # fall back to plain -O2 for toolchains that reject it.
    for flags in (["-O3", "-march=native", "-funroll-loops"], ["-O2"]):
        try:
            r = subprocess.run(
                ["g++", *flags, "-pthread", "-shared", "-fPIC", _SRC,
                 "-o", _SO + ".tmp"],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                os.replace(_SO + ".tmp", _SO)
                return True
        except (OSError, subprocess.SubprocessError):
            # A timeout/OSError on the -O3 -march=native attempt must not
            # skip the plain -O2 fallback.
            continue
    return False


def get_lib():
    """Returns the loaded native library or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.omm_xxh64.restype = ctypes.c_uint64
        lib.omm_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.c_uint64]
        lib.omm_lz4_decompress_safe.restype = ctypes.c_int
        lib.omm_lz4_decompress_safe.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.omm_lz4_compress_default.restype = ctypes.c_int
        lib.omm_lz4_compress_default.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.omm_lz4_compress_bound.restype = ctypes.c_int
        lib.omm_lz4_compress_bound.argtypes = [ctypes.c_int]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.omm_pack_states.restype = None
        lib.omm_pack_states.argtypes = [u8p, ctypes.c_size_t, ctypes.c_int,
                                        u8p]
        lib.omm_unpack_2bit_strided.restype = None
        lib.omm_unpack_2bit_strided.argtypes = [u8p, ctypes.c_size_t,
                                                ctypes.c_size_t, u8p]
        lib.omm_hamming_u8.restype = ctypes.c_size_t
        lib.omm_hamming_u8.argtypes = [u8p, u8p, ctypes.c_size_t]
        lib.omm_states3_xxh64.restype = ctypes.c_uint64
        lib.omm_states3_xxh64.argtypes = [u8p, ctypes.c_size_t,
                                          ctypes.c_uint64]
        lib.omm_all_uniform_u8.restype = ctypes.c_int
        lib.omm_all_uniform_u8.argtypes = [u8p, ctypes.c_size_t]
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.omm_row_post.restype = None
        lib.omm_row_post.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                     u64p, i32p]
        lib.omm_pack_states_batch.restype = None
        lib.omm_pack_states_batch.argtypes = [u64p, i64p, i32p, i64p,
                                              ctypes.c_int64, u8p]
        lib.omm_reconstruct_states.restype = None
        lib.omm_reconstruct_states.argtypes = [
            u8p, i64p, ctypes.c_int64, i32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p, i32p, ctypes.c_int32,
            ctypes.c_uint8, ctypes.c_uint8, u8p, i32p, ctypes.c_int64,
            u8p, ctypes.c_int32]
        lib.omm_reconstruct_packed.restype = None
        lib.omm_reconstruct_packed.argtypes = [
            u8p, i64p, ctypes.c_int64, i32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p, i32p, ctypes.c_int32,
            ctypes.c_uint8, ctypes.c_uint8, i32p, ctypes.c_int64, u8p,
            i64p, ctypes.c_int32]
        lib.omm_row_post_packed.restype = None
        lib.omm_row_post_packed.argtypes = [u8p, ctypes.c_int64,
                                            ctypes.c_int64, u64p, i32p,
                                            i64p]
        lib.omm_unpack_2bit_seq.restype = None
        lib.omm_unpack_2bit_seq.argtypes = [u8p, ctypes.c_size_t, u8p]
        _LIB = lib
        return _LIB


def _u8ptr(arr):
    import numpy as np
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def pack_states(states, bits: int):
    """OC1 bit-pack (M,) uint8 -> bytes array; native fast path with a
    vectorized numpy fallback (bake_cpu_impl.cpp:1802-1819 packing)."""
    import numpy as np
    s = np.ascontiguousarray(states, dtype=np.uint8)
    m = len(s)
    per = 4 if bits == 2 else 8
    nbytes = max((m * bits + 7) >> 3, 1)
    lib = get_lib()
    if lib is not None:
        out = np.zeros(nbytes, dtype=np.uint8)
        lib.omm_pack_states(_u8ptr(s), m, bits, _u8ptr(out))
        return out
    out = np.zeros(nbytes, dtype=np.uint8)
    full = (m // per) * per
    if full:
        v = s[:full].reshape(-1, per)
        if bits == 2:
            out[: full // 4] = ((v[:, 0] & 3) | ((v[:, 1] & 3) << 2)
                                | ((v[:, 2] & 3) << 4) | ((v[:, 3] & 3) << 6))
        else:
            acc = np.zeros(full // 8, np.uint8)
            for k in range(8):
                acc |= (v[:, k] & 1) << k
            out[: full // 8] = acc
    for j in range(full, m):
        if bits == 2:
            out[j >> 2] |= np.uint8((s[j] & 3) << ((j & 3) << 1))
        else:
            out[j >> 3] |= np.uint8((s[j] & 1) << (j & 7))
    return out


def pack_states_into(states, bits: int, out) -> bool:
    """OC1 bit-pack directly into a caller-provided zeroed uint8 view
    (the bake's array-data buffer) — skips the intermediate allocation
    and OR pass of pack_states.  Returns False when the native library
    is unavailable (caller falls back to pack_states + copy)."""
    import numpy as np
    lib = get_lib()
    if lib is None or not out.flags["C_CONTIGUOUS"]:
        return False
    s = np.ascontiguousarray(states, dtype=np.uint8)
    lib.omm_pack_states(_u8ptr(s), len(s), bits, _u8ptr(out))
    return True


def pack_states_batch(state_arrs, bits_list, offs, out) -> bool:
    """Pack every item's states into `out` at the given byte offsets in
    ONE native call (the per-item form pays a python->C transition per
    work item).  state_arrs must be C-contiguous uint8 arrays.  Returns
    False when the native library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None or not hasattr(lib, "omm_pack_states_batch") \
            or not out.flags["C_CONTIGUOUS"]:
        return False
    n = len(state_arrs)
    # The native call reads raw pointers: anything non-contiguous or not
    # uint8 would pack garbage, so normalize (no-op for conforming inputs).
    state_arrs = [a if a.dtype == np.uint8 and a.flags["C_CONTIGUOUS"]
                  else np.ascontiguousarray(a, np.uint8)
                  for a in state_arrs]
    ptrs = np.fromiter((a.ctypes.data for a in state_arrs), np.uint64, n)
    ms = np.fromiter((a.shape[0] for a in state_arrs), np.int64, n)
    bt = np.asarray(bits_list, np.int32)
    of = np.asarray(offs, np.int64)
    lib.omm_pack_states_batch(
        ptrs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ms.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        of.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, _u8ptr(out))
    return True


def states3_digest(states, seed: int = 0):
    """XXH64 of the 3-state view (UT==UO) WITHOUT materializing the
    remapped copy — the exact-dedup key (bake_cpu_impl.cpp:1031-1066).
    Returns None when the native library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    s = np.ascontiguousarray(states, dtype=np.uint8)
    return int(lib.omm_states3_xxh64(_u8ptr(s), len(s), seed))


def all_uniform_u8(arr):
    """states[0] if every byte matches it, else -1; None when the native
    library is unavailable.  Early-exits at the first differing word."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    return int(lib.omm_all_uniform_u8(_u8ptr(a), len(a)))


def unpack_2bit_strided(packed, m: int):
    """Inverse of the device-side strided 2-bit pack (twophase._stageD)."""
    import numpy as np
    p = np.ascontiguousarray(packed, dtype=np.uint8)
    q = len(p)
    lib = get_lib()
    if lib is not None:
        out = np.empty(m, dtype=np.uint8)
        lib.omm_unpack_2bit_strided(_u8ptr(p), q, m, _u8ptr(out))
        return out
    out = np.empty((4, q), np.uint8)
    out[0] = p & 3
    out[1] = (p >> 2) & 3
    out[2] = (p >> 4) & 3
    out[3] = (p >> 6) & 3
    return out.reshape(-1)[:m]


def hamming_u8(a, b) -> int:
    """Count of differing bytes (near-duplicate merge distance)."""
    import numpy as np
    aa = np.ascontiguousarray(a, dtype=np.uint8)
    bb = np.ascontiguousarray(b, dtype=np.uint8)
    lib = get_lib()
    if lib is not None:
        return int(lib.omm_hamming_u8(_u8ptr(aa), _u8ptr(bb), len(aa)))
    return int(np.count_nonzero(aa != bb))


def _payload_offsets(hdr, levels, T, Cs_cap, skip_final):
    """Side-stream offsets + finals offset of the compressed payload.
    With skip_final the final level ships NO side stream (its children
    all go to the exact kernel — twophase._skip_final_p); offs still has
    m+1 entries (the last one is never read by the C++ then)."""
    import numpy as np
    m = len(levels) - 1
    N0 = 1 << (2 * levels[0])
    sizes = [T * N0] + [int(Cs_cap[i]) * 4 ** (levels[i + 1] - levels[i])
                        for i in range(m - 1 if skip_final else m)]
    offs = np.empty(m + 1, np.int64)
    o = hdr
    for i, s in enumerate(sizes):
        offs[i] = o
        o += s // 4
    if skip_final:
        offs[m] = o  # placeholder; no final-level side stream
    return offs, o, max(sizes)


def reconstruct_states(buf, hdr: int, levels, T: int, subdiv: int,
                       Cs, Cs_cap, K: int, K_cap: int,
                       st_gt: int, st_le: int, active,
                       skip_final: bool = False):
    """Replay the two-phase descent from a compressed payload into a
    (T, M) uint8 state array (the C++ fast path of
    twophase._BatchCtx.finish_compact).  Returns None when the native
    library is unavailable; callers fall back to the numpy replay."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    levels = list(levels)
    m = len(levels) - 1
    M = 1 << (2 * subdiv)
    offs, final_off, max_nodes = _payload_offsets(hdr, levels, T, Cs_cap,
                                                  skip_final)
    # 4 * max_nodes: two ping-pong (node_t, node_n) candidate lists
    scratch = np.empty(4 * max_nodes, np.int32)
    out = np.empty(T * M, np.uint8)
    b = np.ascontiguousarray(buf, np.uint8)
    lv = np.asarray(levels, np.int32)
    cs = np.asarray(Cs, np.int32)
    cc = np.asarray(Cs_cap, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    act = active
    if act is not None:
        act = np.ascontiguousarray(act.reshape(-1), np.uint8)
    lib.omm_reconstruct_states(
        _u8ptr(b), offs.ctypes.data_as(i64p), ctypes.c_int64(final_off),
        lv.ctypes.data_as(i32p), m + 1, T, subdiv,
        cs.ctypes.data_as(i32p), cc.ctypes.data_as(i32p),
        min(int(K), int(K_cap)), ctypes.c_uint8(st_gt),
        ctypes.c_uint8(st_le),
        _u8ptr(act) if act is not None else
        ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8)),
        scratch.ctypes.data_as(i32p), max_nodes, _u8ptr(out),
        ctypes.c_int32(1 if skip_final else 0))
    return out.reshape(T, M)


def row_post(block):
    """Per-row (3-state digest, raw uniform value) over a contiguous
    (rows, M) uint8 state block in ONE cache-warm pass — row r's results
    equal states3_digest(block[r]) and all_uniform_u8(block[r]).  Runs
    right after the C++ payload replay so the bake tail's exact-dedup
    and special-index promotion skip their own full passes.  Returns
    (digests uint64 (rows,), uniform int32 (rows,)) or None when the
    native library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None or not hasattr(lib, "omm_row_post"):
        return None
    b = np.ascontiguousarray(block, dtype=np.uint8)
    rows, M = b.shape
    dig = np.empty(rows, np.uint64)
    uni = np.empty(rows, np.int32)
    lib.omm_row_post(_u8ptr(b), rows, M,
                     dig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                     uni.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return dig, uni


def reconstruct_packed(buf, hdr: int, levels, T: int, subdiv: int,
                       Cs, Cs_cap, K: int, K_cap: int,
                       st_gt: int, st_le: int,
                       row_base=None, out=None, skip_final: bool = False):
    """Packed-direct replay: same descent as reconstruct_states but
    returns (T, M/4) uint8 rows in serialize's sequential 2-bit
    OC1_4_State layout (state j in byte j>>2 at shift (j&3)*2) — 4x less
    memory written, and the bake memcpys rows straight into the result
    blob.  ALL-ACTIVE batches only (no prior-state merge).  Returns None
    when the native library is unavailable.

    row_base + out (both or neither): the speculative-serialize sink —
    row t is written at byte offset row_base[t] of `out` (the final
    result blob), so serialize never copies the rows again.  Requires
    subdiv >= 1 (whole-byte rows).  Returns True on success."""
    import numpy as np
    lib = get_lib()
    if lib is None or not hasattr(lib, "omm_reconstruct_packed"):
        return None
    levels = list(levels)
    m = len(levels) - 1
    M = 1 << (2 * subdiv)
    offs, final_off, max_nodes = _payload_offsets(hdr, levels, T, Cs_cap,
                                                  skip_final)
    scratch = np.empty(4 * max_nodes, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    if out is None:
        sink = np.empty(T * (M >> 2), np.uint8)
        rbp = None
    else:
        if subdiv < 1 or not (out.flags["C_CONTIGUOUS"]
                              and out.dtype == np.uint8):
            return None
        sink = out
        rb = np.ascontiguousarray(row_base, np.int64)
        rbp = rb.ctypes.data_as(i64p)
    b = np.ascontiguousarray(buf, np.uint8)
    lv = np.asarray(levels, np.int32)
    cs = np.asarray(Cs, np.int32)
    cc = np.asarray(Cs_cap, np.int32)
    lib.omm_reconstruct_packed(
        _u8ptr(b), offs.ctypes.data_as(i64p), ctypes.c_int64(final_off),
        lv.ctypes.data_as(i32p), m + 1, T, subdiv,
        cs.ctypes.data_as(i32p), cc.ctypes.data_as(i32p),
        min(int(K), int(K_cap)), ctypes.c_uint8(st_gt),
        ctypes.c_uint8(st_le),
        scratch.ctypes.data_as(i32p), max_nodes, _u8ptr(sink), rbp,
        ctypes.c_int32(1 if skip_final else 0))
    return True if out is not None else sink.reshape(T, M >> 2)


def row_post_packed(packed, M: int, row_base=None):
    """row_post over PACKED rows: (rows, M/4) sequential-2-bit block ->
    per-row (3-state digest, uniform value), digests byte-identical to
    states3_digest of the unpacked rows.  Returns None when the native
    library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None or not hasattr(lib, "omm_row_post_packed"):
        return None
    b = np.ascontiguousarray(packed, dtype=np.uint8)
    if row_base is not None:
        # rows scattered inside a blob (the speculative-serialize
        # layout): row r starts at byte row_base[r] of `packed`
        rb = np.ascontiguousarray(row_base, np.int64)
        rows = rb.shape[0]
        rbp = rb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    else:
        rows = b.shape[0]
        rbp = None
    dig = np.empty(rows, np.uint64)
    uni = np.empty(rows, np.int32)
    lib.omm_row_post_packed(
        _u8ptr(b), rows, M,
        dig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        uni.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), rbp)
    return dig, uni


def unpack_2bit_seq(packed, M: int):
    """Sequential 2-bit unpack (inverse of reconstruct_packed rows):
    lazy materialization of WorkItem.states.  numpy fallback when the
    native library is unavailable."""
    import numpy as np
    p = np.ascontiguousarray(packed, np.uint8)
    lib = get_lib()
    out = np.empty(M, np.uint8)
    if lib is not None and hasattr(lib, "omm_unpack_2bit_seq"):
        lib.omm_unpack_2bit_seq(_u8ptr(p), M, _u8ptr(out))
        return out
    idx = np.arange(M)
    return ((p[idx >> 2] >> ((idx & 3) << 1)) & 3).astype(np.uint8)


def xxh64(data: bytes, seed: int = 0) -> int:
    lib = get_lib()
    if lib is not None:
        return int(lib.omm_xxh64(data, len(data), seed))
    import xxhash
    return xxhash.xxh64(data, seed=seed).intdigest()


def lz4_compress(data: bytes) -> bytes:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native LZ4 unavailable (g++ missing?)")
    bound = lib.omm_lz4_compress_bound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.omm_lz4_compress_default(data, len(data), out, bound)
    if n < 0:
        raise RuntimeError("LZ4 compression failed")
    return out.raw[:n]


def lz4_decompress(data: bytes, decompressed_size: int) -> bytes:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native LZ4 unavailable (g++ missing?)")
    out = ctypes.create_string_buffer(decompressed_size)
    n = lib.omm_lz4_decompress_safe(data, len(data), out, decompressed_size)
    if n < 0:
        raise RuntimeError("LZ4 decompression failed (corrupt blob)")
    return out.raw[:n]
