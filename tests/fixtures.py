"""Shared procedural test textures and bake helpers.

These reproduce the reference test fixtures (test_omm_bake_cpu.cpp:64-76 and
the per-test lambdas) exactly in fp32 so the hard-coded expected stats from
the reference suite serve as parity oracles.
"""
from __future__ import annotations

import numpy as np

import omm_tpu as omm

F = np.float32


def standard_circle(w: int, h: int) -> np.ndarray:
    """StandardCircle (test_omm_bake_cpu.cpp:64-76)."""
    j, i = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = i.astype(np.float32) / np.float32(w)
    v = j.astype(np.float32) / np.float32(w)
    du = u - np.float32(0.5)
    dv = v - np.float32(0.5)
    r = np.sqrt(du * du + dv * dv)
    out = np.where(r < np.float32(0.4), np.float32(0.0), np.float32(1.0))
    out = out.astype(np.float32)
    out[0, 0] = np.float32(0.6)
    return out


def sine_fp32(w: int, h: int) -> np.ndarray:
    """Sine test texture (test_omm_bake_cpu.cpp:1026-1033)."""
    i = np.arange(w, dtype=np.float32)
    uv = (i / np.float32(w)).astype(np.float32)
    row = (np.float32(1.0) - np.sin(uv * np.float32(15.0),
                                    dtype=np.float32)).astype(np.float32)
    out = np.broadcast_to(row, (h, w)).copy()
    out[0, 0] = np.float32(0.6)
    return out


def sine_unorm8(w: int, h: int) -> np.ndarray:
    """SineUNORM8 (test_omm_bake_cpu.cpp:1006-1011)."""
    i = np.arange(w, dtype=np.float32)
    uv = i / np.float32(w)
    val = np.float32(0.5) - np.float32(0.5) * np.sin(uv * np.float32(15.0),
                                                     dtype=np.float32)
    val8 = (val * np.float32(255.0)).astype(np.uint8)
    return np.broadcast_to(val8, (h, w)).copy()


def mandelbrot(w: int, h: int) -> np.ndarray:
    """Mandelbrot alpha (test_omm_bake_cpu.cpp:1088-1113), fp32."""
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    uvx = np.float32(1.2) * i / np.float32(w) - np.float32(0.1)
    uvy = np.float32(1.2) * j / np.float32(h) - np.float32(0.1)
    cx = np.float32(2.0) * uvx - np.float32(1.0) - np.float32(0.5)
    cy = np.float32(2.0) * uvy - np.float32(1.0)
    zx = np.zeros_like(cx)
    zy = np.zeros_like(cy)
    inside = np.ones(cx.shape, dtype=bool)
    for _ in range(20):
        nzx = (zx * zx - zy * zy + cx).astype(np.float32)
        nzy = (zx * zy + zy * zx + cy).astype(np.float32)
        zx = np.where(inside, nzx, zx)
        zy = np.where(inside, nzy, zy)
        mag = np.sqrt(zx * zx + zy * zy)
        inside &= ~(mag > np.float32(2.0))
    return np.where(inside, np.float32(0.0), np.float32(1.0)).astype(np.float32)


def julia(w: int, h: int) -> np.ndarray:
    """GetJulia (test_omm_bake_cpu.cpp:1214-1241), fp32, vectorized."""
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    uvx = np.float32(1.2) * i / np.float32(w) - np.float32(0.1)
    uvy = np.float32(1.2) * j / np.float32(h) - np.float32(0.1)
    z0x = np.float32(5.0) * (uvx - np.float32(0.5))
    z0y = np.float32(5.0) * (uvy - np.float32(0.27))
    time = np.float32(3.1)
    ct = np.float32(np.cos(time))
    cx = ct * np.float32(np.cos(time / np.float32(2.0)))
    cy = ct * np.float32(np.sin(time / np.float32(2.0)))
    colx = np.zeros_like(z0x)
    active = np.ones(z0x.shape, dtype=bool)
    for it in range(500):
        zx = (z0x * z0x - z0y * z0y + cx).astype(np.float32)
        zy = (z0x * z0y + z0y * z0x + cy).astype(np.float32)
        mq = (zx * zx + zy * zy).astype(np.float32)
        esc = active & (mq > np.float32(4.0))
        colx = np.where(esc, np.float32(it) / np.float32(20.0), colx)
        cont = active & ~esc
        z0x = np.where(cont, zx, z0x)
        z0y = np.where(cont, zy, z0y)
        colx = np.where(cont, mq / np.float32(2.0), colx)
        active = cont
    alpha = np.where(np.clip(colx, np.float32(0.0), np.float32(1.0))
                     >= np.float32(0.5), np.float32(0.6), np.float32(0.4))
    return (np.float32(1.0) - alpha).astype(np.float32)


def hexagons(w: int, h: int) -> np.ndarray:
    """Hexagon grid (test_omm_bake_cpu.cpp:1432-1443), fp32."""
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    scale = np.float32(30.0)
    thick = np.float32(0.2)
    px = scale * i / np.float32(1024.0)
    py = scale * j / np.float32(1024.0)
    px = px * np.float32(0.57735 * 2.0)
    py = py + np.float32(0.5) * (np.floor(px).astype(np.int64).astype(np.uint32)
                                 % np.uint32(2)).astype(np.float32)
    px = np.abs(px - np.floor(px) - np.float32(0.5))
    py = np.abs(py - np.floor(py) - np.float32(0.5))
    d = np.abs(np.maximum(px * np.float32(1.5) + py, py * np.float32(2.0))
               - np.float32(1.0))
    # glm::smoothstep(0, thick, d)
    t = np.clip(d / thick, np.float32(0.0), np.float32(1.0))
    return (t * t * (np.float32(3.0) - np.float32(2.0) * t)).astype(np.float32)


DEFAULT_TEXCOORDS = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]],
                             dtype=np.float32)
DEFAULT_INDICES = np.array([0, 1, 2, 3, 1, 2], dtype=np.uint32)


def bake_stats(alpha_plane, alpha_cutoff, subdivision_level,
               tex_coords=None, indices=None, fmt=omm.Format.OC1_4_State,
               addressing_mode=omm.TextureAddressMode.Clamp,
               unknown_promotion=omm.UnknownStatePromotion.Nearest,
               unorm8=False, embed_cutoff=False, backend="numpy",
               merge_similar=False, enable_special=True, force32=False,
               mips=None, dynamic_subdivision_scale=0.0,
               unresolved=omm.SpecialIndex.FullyUnknownOpaque,
               max_workload_size=0xFFFFFFFFFFFFFFFF,
               tex_coord_format=omm.TexCoordFormat.UV32_FLOAT,
               cutoff_le=omm.OpacityState.Transparent,
               cutoff_gt=omm.OpacityState.Opaque):
    """Mirror of the reference GetOmmBakeStats* helpers
    (test_omm_bake_cpu.cpp:168-638)."""
    planes = mips if mips is not None else [alpha_plane]
    tex = omm.Texture(planes,
                      omm.TextureFormat.UNORM8 if unorm8 else omm.TextureFormat.FP32,
                      alpha_cutoff=alpha_cutoff if embed_cutoff else -1.0)
    flags = omm.BakeFlags.EnableInternalThreads
    if merge_similar:
        flags |= omm.BakeFlags.EnableNearDuplicateDetection
    if not enable_special:
        flags |= omm.BakeFlags.DisableSpecialIndices
    if force32:
        flags |= omm.BakeFlags.Force32BitIndices
    tc = DEFAULT_TEXCOORDS if tex_coords is None else tex_coords
    ib = DEFAULT_INDICES if indices is None else np.asarray(indices, np.uint32)
    desc = omm.BakeInputDesc(
        texture=tex,
        bake_flags=flags,
        runtime_sampler=omm.SamplerDesc(addressing_mode=addressing_mode,
                                        filter=omm.TextureFilterMode.Linear),
        alpha_mode=omm.AlphaMode.Test,
        tex_coord_format=tex_coord_format,
        tex_coords=tc,
        index_format=omm.IndexFormat.UINT_32,
        index_buffer=ib,
        index_count=len(ib),
        alpha_cutoff=alpha_cutoff,
        format=fmt,
        unknown_state_promotion=unknown_promotion,
        max_subdivision_level=subdivision_level,
        dynamic_subdivision_scale=dynamic_subdivision_scale,
        unresolved_tri_state=unresolved,
        max_workload_size=max_workload_size,
        alpha_cutoff_less_equal=cutoff_le,
        alpha_cutoff_greater=cutoff_gt,
    )
    result = omm.bake(desc, backend=backend)
    return omm.get_stats(result)


def expect_stats(stats, total_opaque=0, total_transparent=0,
                 total_unknown_transparent=0, total_unknown_opaque=0,
                 total_fully_opaque=0, total_fully_transparent=0,
                 total_fully_unknown_opaque=0,
                 total_fully_unknown_transparent=0):
    got = (stats.total_opaque, stats.total_transparent,
           stats.total_unknown_transparent, stats.total_unknown_opaque,
           stats.total_fully_opaque, stats.total_fully_transparent,
           stats.total_fully_unknown_opaque,
           stats.total_fully_unknown_transparent)
    want = (total_opaque, total_transparent, total_unknown_transparent,
            total_unknown_opaque, total_fully_opaque, total_fully_transparent,
            total_fully_unknown_opaque, total_fully_unknown_transparent)
    assert got == want, f"stats mismatch: got {got}, want {want}"
