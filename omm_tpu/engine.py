"""Resample engines: coarse SAT pass + fine classification passes.

One classification engine with three backends (SURVEY.md §7 design stance):
  - numpy: the bit-exact parity oracle (and the host fallback),
  - jax:   identical array code under jax.numpy/jit,
  - pallas: hand-tiled TPU kernel for the hot path (kernels/pallas_classify).

Pipeline-stage semantics mirror the reference CPU baker:
  ResampleCoarse  bake_cpu_impl.cpp:715-808  (SAT box test, mip0 only)
  ResampleFine    bake_cpu_impl.cpp:816-1029 (level-line / nearest / AABB)
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import bird, geom
from .kernels.levelline import (conservative_raster_mask,
                                get_state_from_coverage,
                                level_line_texel_kernel, make_tri_params)
from .kernels.raster import conservative_line_cells_batch
from .texture import Texture, gather_tex_coord4, get_tex_coord
from .types import (Format, OpacityState, TextureAddressMode,
                    TextureFilterMode, UnknownStatePromotion,
                    get_num_micro_triangles)

UO = int(OpacityState.UnknownOpaque)
CHUNK = 16384  # micro-triangles per vectorized block (bounds peak memory)


@dataclass
class ResampleConfig:
    addr_mode: TextureAddressMode
    filter: TextureFilterMode
    alpha_cutoff: float
    border_alpha: float
    fmt: Format                        # desc.format (global, used for state)
    promotion: UnknownStatePromotion
    cutoff_gt: OpacityState
    cutoff_le: OpacityState
    disable_level_line: bool = False
    enable_aabb_testing: bool = False
    disable_fine: bool = False


def _states_from_cov(xp, cfg: ResampleConfig, above, below):
    return get_state_from_coverage(xp, cfg.fmt, cfg.promotion, cfg.cutoff_gt,
                                   cfg.cutoff_le, above, below)


def _is_unknown_state(st):
    return (st == int(OpacityState.UnknownTransparent)) | (st == UO)


# ---------------------------------------------------------------------------
# Coarse SAT pass (bake_cpu_impl.cpp:715-808)
# ---------------------------------------------------------------------------

def resample_coarse_item(texture: Texture, cfg: ResampleConfig,
                         uv_tri: np.ndarray, subdiv: int,
                         states: np.ndarray) -> np.ndarray:
    """SAT-based box classification of micro-triangles fully above/below the
    cutoff.  Runs only with an embedded alpha cutoff, single mip, linear
    filter; mutates nothing, returns updated states."""
    if not texture.has_sat() or texture.mip_count != 1:
        return states
    if cfg.filter != TextureFilterMode.Linear:
        return states

    mip = 0
    w, h = texture.size(mip)
    M = get_num_micro_triangles(subdiv)
    idx = np.arange(M, dtype=np.uint32)
    uvs = bird.micro_triangle_uvs(uv_tri, idx, subdiv)  # (M, 3, 2) fp32
    aabb_s, aabb_e = geom.tri_aabb(uvs)

    # Require the whole micro-tri inside one integer UV cell (no wrap).
    sx = aabb_s[:, 0].astype(np.int32)
    sy = aabb_s[:, 1].astype(np.int32)
    ex = aabb_e[:, 0].astype(np.int32)
    ey = aabb_e[:, 1].astype(np.int32)
    ok = (sx == ex) & (sy == ey)

    sizef = np.array([w, h], dtype=np.float32)
    f_s = np.floor(aabb_s * sizef - np.float32(0.5))
    f_e = np.floor(aabb_e * sizef - np.float32(0.5))
    size_i = np.array([w, h], np.int32)
    log2_i = np.array(texture.info[mip].size_log2, np.int32)
    pow2 = texture.info[mip].is_pow2
    c00s, _, _, _ = gather_tex_coord4(cfg.addr_mode, f_s.astype(np.int32),
                                      size_i, log2_i, pow2)
    _, _, _, c11e = gather_tex_coord4(cfg.addr_mode, f_e.astype(np.int32),
                                      size_i, log2_i, pow2)
    s_c = c00s
    e_c = c11e
    ok &= ~((e_c[:, 0] < s_c[:, 0]) | (e_c[:, 1] < s_c[:, 1]))
    ok &= texture.in_texture(s_c, mip) & texture.in_texture(e_c, mip)

    sel = np.nonzero(ok)[0]
    if len(sel) == 0:
        return states
    s_sel = s_c[sel]
    e_sel = e_c[sel]
    area = ((e_sel[:, 0] - s_sel[:, 0] + 1)
            * (e_sel[:, 1] - s_sel[:, 1] + 1)).astype(np.uint32)
    sa = texture.sat_query(s_sel, e_sel, mip)

    out = states.copy()
    out[sel[sa == 0]] = int(cfg.cutoff_le)
    out[sel[sa == area]] = int(cfg.cutoff_gt)
    return out


# ---------------------------------------------------------------------------
# Fine pass building blocks
# ---------------------------------------------------------------------------

def _linear_mip_pass(xp, texture: Texture, cfg: ResampleConfig,
                     micro_uvs, ccw, mip: int):
    """One mip of the level-line fine pass for a block of micro-triangles.

    micro_uvs: (B, 3, 2) fp32; ccw: (B,) bool (host-derived winding).
    Returns (above_inc, below_inc) int32 (B,) for this mip, including the
    seed bilinear sample at p0 (bake_cpu_impl.cpp:886-904)."""
    info = texture.info[mip]
    w, h = info.size
    rf = xp.asarray(np.array([w, h], dtype=np.float32))
    off = xp.float32(-0.5)

    # Seed sample at p0 (runtime bilinear).
    seed = texture.bilinear(cfg.addr_mode, micro_uvs[:, 0, :], mip, xp)
    seed_above = xp.float32(cfg.alpha_cutoff) < seed

    # Raster-space triangle with CCW normalization (cpu_raster.h:289-296).
    q = micro_uvs * rf + off
    qn = xp.where(ccw[:, None, None], q, q[:, ::-1, :])

    amin = qn.min(axis=-2)
    amax = qn.max(axis=-2)
    ix0 = xp.floor(amin[:, 0]).astype(xp.int32)
    iy0 = xp.floor(amin[:, 1]).astype(xp.int32)
    ix1 = xp.ceil(amax[:, 0]).astype(xp.int32)
    iy1 = xp.ceil(amax[:, 1]).astype(xp.int32)

    W = int(np.max(np.asarray(ix1 - ix0)))
    H = int(np.max(np.asarray(iy1 - iy0)))

    x = ix0[:, None, None] + xp.arange(W, dtype=xp.int32)[None, None, :]
    y = iy0[:, None, None] + xp.arange(H, dtype=xp.int32)[None, :, None]
    inb = (x < ix1[:, None, None]) & (y < iy1[:, None, None])
    x = xp.broadcast_to(x, (q.shape[0], H, W))
    y = xp.broadcast_to(y, (q.shape[0], H, W))
    mask = inb & conservative_raster_mask(xp, qn, x, y)

    tp = make_tri_params(xp, micro_uvs)
    with np.errstate(all="ignore"):
        a_inc, b_inc = level_line_texel_kernel(
            xp, micro_uvs, tp, x, y, texture.load_plane(mip),
            (w, h), info.size_log2, info.is_pow2,
            (float(info.rcp_size[0]), float(info.rcp_size[1])),
            cfg.addr_mode, cfg.alpha_cutoff, cfg.border_alpha,
            degenerate=False)
    zero = xp.int32(0)
    above = xp.where(mask, a_inc, zero).sum(axis=(-1, -2)).astype(xp.int32)
    below = xp.where(mask, b_inc, zero).sum(axis=(-1, -2)).astype(xp.int32)
    above = above + seed_above.astype(xp.int32)
    below = below + (~seed_above).astype(xp.int32)
    return above, below


def _nearest_mip_pass(xp, texture: Texture, cfg: ResampleConfig,
                      micro_uvs, ccw, mip: int):
    """One mip of the nearest-filter fine pass (bake_cpu_impl.cpp:969-1022):
    conservative raster with zero offset, single texel load per cell."""
    info = texture.info[mip]
    w, h = info.size
    rf = xp.asarray(np.array([w, h], dtype=np.float32))

    q = micro_uvs * rf
    qn = xp.where(ccw[:, None, None], q, q[:, ::-1, :])
    amin = qn.min(axis=-2)
    amax = qn.max(axis=-2)
    ix0 = xp.floor(amin[:, 0]).astype(xp.int32)
    iy0 = xp.floor(amin[:, 1]).astype(xp.int32)
    ix1 = xp.ceil(amax[:, 0]).astype(xp.int32)
    iy1 = xp.ceil(amax[:, 1]).astype(xp.int32)
    W = int(np.max(np.asarray(ix1 - ix0)))
    H = int(np.max(np.asarray(iy1 - iy0)))

    x = ix0[:, None, None] + xp.arange(W, dtype=xp.int32)[None, None, :]
    y = iy0[:, None, None] + xp.arange(H, dtype=xp.int32)[None, :, None]
    inb = (x < ix1[:, None, None]) & (y < iy1[:, None, None])
    x = xp.broadcast_to(x, (q.shape[0], H, W))
    y = xp.broadcast_to(y, (q.shape[0], H, W))
    mask = inb & conservative_raster_mask(xp, qn, x, y)

    size_i = np.array([w, h], np.int32)
    log2_i = np.array(info.size_log2, np.int32)
    coord = get_tex_coord(cfg.addr_mode, xp.stack([x, y], axis=-1),
                          size_i, log2_i, info.is_pow2, xp)
    alpha = texture.load_or_border(coord, mip, cfg.border_alpha, xp) \
        if cfg.addr_mode == TextureAddressMode.Border \
        else texture.load(coord, mip, xp)
    above_t = xp.float32(cfg.alpha_cutoff) < alpha
    zero = xp.int32(0)
    one = xp.int32(1)
    above = xp.where(mask & above_t, one, zero).sum(axis=(-1, -2))
    below = xp.where(mask & ~above_t, one, zero).sum(axis=(-1, -2))
    return above.astype(xp.int32), below.astype(xp.int32)


def _degenerate_mip_pass(texture: Texture, cfg: ResampleConfig,
                         micro_uvs: np.ndarray, mip: int):
    """One mip of the degenerate (line) level-line pass
    (bake_cpu_impl.cpp:896-904).  The DDA cell walks are sequential per
    micro-triangle, but the per-cell level-line kernel runs as ONE batched
    call over the padded (B, Kmax) cell lists — above/below are integer
    counts, so regrouping the per-cell sums is exact.  Includes the seed
    bilinear sample."""
    xp = np
    info = texture.info[mip]
    w, h = info.size
    B = micro_uvs.shape[0]
    above = np.zeros(B, dtype=np.int32)
    below = np.zeros(B, dtype=np.int32)

    seed = texture.bilinear(cfg.addr_mode, micro_uvs[:, 0, :], mip)
    sa = np.float32(cfg.alpha_cutoff) < seed
    above += sa.astype(np.int32)
    below += (~sa).astype(np.int32)

    aabb_s, aabb_e = geom.tri_aabb(micro_uvs)
    plane = texture.load_plane(mip)
    x, y, mask = conservative_line_cells_batch(aabb_s, aabb_e, (w, h),
                                               (-0.5, -0.5))
    with np.errstate(all="ignore"):
        a_inc, b_inc = level_line_texel_kernel(
            xp, micro_uvs, make_tri_params(xp, micro_uvs),
            x[:, :, None], y[:, :, None], plane, (w, h),
            info.size_log2, info.is_pow2,
            (float(info.rcp_size[0]), float(info.rcp_size[1])),
            cfg.addr_mode, cfg.alpha_cutoff, cfg.border_alpha,
            degenerate=True, aabb_s=aabb_s, aabb_e=aabb_e)
    zero = np.int32(0)
    m3 = mask[:, :, None]
    above += np.where(m3, a_inc, zero).sum(axis=(-1, -2)).astype(np.int32)
    below += np.where(m3, b_inc, zero).sum(axis=(-1, -2)).astype(np.int32)
    return above, below


def _aabb_kernel_mip_pass(xp, texture: Texture, cfg: ResampleConfig,
                          micro_uvs, mip: int, two_tris: bool):
    """ConservativeBilinearKernel passes (internal debug modes,
    bake_cpu_impl.cpp:915-966).  two_tris=True rasterizes the AABB split
    into two triangles (EnableAABBTesting)."""
    info = texture.info[mip]
    w, h = info.size
    rf = np.array([w, h], dtype=np.float32)
    off = np.float32(-0.5)

    aabb_s, aabb_e = geom.tri_aabb(micro_uvs)
    if two_tris:
        t0 = np.stack([aabb_s,
                       np.stack([aabb_e[:, 0], aabb_s[:, 1]], -1),
                       np.stack([aabb_s[:, 0], aabb_e[:, 1]], -1)], axis=1)
        t1 = np.stack([aabb_e,
                       np.stack([aabb_e[:, 0], aabb_s[:, 1]], -1),
                       np.stack([aabb_s[:, 0], aabb_e[:, 1]], -1)], axis=1)
        tris = [t0, t1]
    else:
        tris = [micro_uvs]

    B = micro_uvs.shape[0]
    above = xp.zeros(B, dtype=xp.int32)
    below = xp.zeros(B, dtype=xp.int32)
    plane = texture.load_plane(mip)
    size_i = np.array([w, h], np.int32)
    log2_i = np.array(info.size_log2, np.int32)
    for tri in tris:
        ccw = geom.is_ccw(tri)
        q = xp.asarray(tri, dtype=xp.float32) * xp.asarray(rf) + off
        qn = xp.where(xp.asarray(ccw)[:, None, None], q, q[:, ::-1, :])
        amin = qn.min(axis=-2)
        amax = qn.max(axis=-2)
        ix0 = xp.floor(amin[:, 0]).astype(xp.int32)
        iy0 = xp.floor(amin[:, 1]).astype(xp.int32)
        ix1 = xp.ceil(amax[:, 0]).astype(xp.int32)
        iy1 = xp.ceil(amax[:, 1]).astype(xp.int32)
        W = int(np.max(np.asarray(ix1 - ix0)))
        H = int(np.max(np.asarray(iy1 - iy0)))
        x = ix0[:, None, None] + xp.arange(W, dtype=xp.int32)[None, None, :]
        y = iy0[:, None, None] + xp.arange(H, dtype=xp.int32)[None, :, None]
        inb = (x < ix1[:, None, None]) & (y < iy1[:, None, None])
        x = xp.broadcast_to(x, (B, H, W))
        y = xp.broadcast_to(y, (B, H, W))
        mask = inb & conservative_raster_mask(xp, qn, x, y)

        pix = xp.stack([(x.astype(xp.float32) + xp.float32(0.5)).astype(xp.int32),
                        (y.astype(xp.float32) + xp.float32(0.5)).astype(xp.int32)],
                       axis=-1)
        c00, c10, c01, c11 = gather_tex_coord4(cfg.addr_mode, pix, size_i,
                                               log2_i, info.is_pow2, xp)

        def load(cc):
            if cfg.addr_mode == TextureAddressMode.Border:
                return texture.load_or_border(cc, mip, cfg.border_alpha, xp)
            return xp.asarray(plane)[cc[..., 1], cc[..., 0]]

        vals = xp.stack([load(c00), load(c01), load(c11), load(c10)])
        vmin = vals.min(axis=0)
        vmax = vals.max(axis=0)
        is_op = xp.float32(cfg.alpha_cutoff) < vmax
        is_tr = xp.float32(cfg.alpha_cutoff) > vmin
        zero = xp.int32(0)
        one = xp.int32(1)
        above = above + xp.where(mask & is_op, one, zero).sum(axis=(-1, -2))
        below = below + xp.where(mask & is_tr, one, zero).sum(axis=(-1, -2))
    return above.astype(xp.int32), below.astype(xp.int32)


# ---------------------------------------------------------------------------
# Fine pass driver
# ---------------------------------------------------------------------------

def resample_fine_item(texture: Texture, cfg: ResampleConfig,
                       uv_tri: np.ndarray, subdiv: int, states: np.ndarray,
                       xp=np) -> np.ndarray:
    """Fine classification of one work item (bake_cpu_impl.cpp:816-1029).

    Only micro-triangles still in the initial UnknownOpaque state are
    processed; the per-mip loop accumulates coverage until a mip flips the
    state to unknown.  Returns updated states (M,) int32.
    """
    if cfg.disable_fine:
        return states

    degen = bool(geom.is_degenerate(uv_tri))
    active0 = states == UO
    sel = np.nonzero(active0)[0]
    if len(sel) == 0:
        return states

    M = get_num_micro_triangles(subdiv)
    idx = np.arange(M, dtype=np.uint32)
    micro_uvs_all = bird.micro_triangle_uvs(uv_tri, idx, subdiv)  # fp32

    out = states.copy()
    for lo in range(0, len(sel), CHUNK):
        block = sel[lo:lo + CHUNK]
        micro_uvs = micro_uvs_all[block]
        B = len(block)
        above = np.zeros(B, dtype=np.int64)
        below = np.zeros(B, dtype=np.int64)
        alive = np.ones(B, dtype=bool)

        use_level_line = (not cfg.disable_level_line
                          and cfg.filter == TextureFilterMode.Linear)
        nearest = cfg.filter == TextureFilterMode.Nearest

        if use_level_line:
            ccw = geom.is_ccw(micro_uvs)
            n_mips = texture.mip_count
        elif nearest:
            ccw = geom.is_ccw(micro_uvs)
            n_mips = texture.mip_count
        else:
            ccw = None
            n_mips = 1  # AABB-kernel debug modes assert single mip

        for mip in range(n_mips):
            if not alive.any():
                break
            live = np.nonzero(alive)[0]
            muv = micro_uvs[live]
            if use_level_line:
                if degen:
                    a_inc, b_inc = _degenerate_mip_pass(texture, cfg, muv, mip)
                else:
                    a_inc, b_inc = _linear_mip_pass(xp, texture, cfg, muv,
                                                    _as_xp(xp, ccw[live]), mip)
            elif nearest:
                a_inc, b_inc = _nearest_mip_pass(xp, texture, cfg, muv,
                                                 _as_xp(xp, ccw[live]), mip)
            else:
                a_inc, b_inc = _aabb_kernel_mip_pass(
                    xp, texture, cfg, muv, mip,
                    two_tris=cfg.enable_aabb_testing)
            above[live] += np.asarray(a_inc, dtype=np.int64)
            below[live] += np.asarray(b_inc, dtype=np.int64)
            st = _states_from_cov(np, cfg, above[live], below[live])
            alive[live] = ~_is_unknown_state(st)

        final = _states_from_cov(np, cfg, above, below)
        out[block] = np.asarray(final, dtype=np.uint8)
    return out


def _as_xp(xp, arr):
    return xp.asarray(arr)
