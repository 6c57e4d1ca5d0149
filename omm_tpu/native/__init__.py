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
    try:
        r = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"],
            capture_output=True, timeout=120)
        if r.returncode != 0:
            return False
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError):
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
        _LIB = lib
        return _LIB


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
