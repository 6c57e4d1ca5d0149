"""Jitted device classification path (jax backend).

The classification of one work item is reformulated for XLA: micro-triangle
corner generation (bird bit-math), conservative raster masks and the
level-line kernel all evaluate densely over a static (block, H, W) texel
grid; the per-texel 2x2 alpha fetches are XLA gathers from the mip plane.
Identical fp32 op order to the numpy oracle (omm_tpu.engine) — outputs are
bit-exact.

Shapes are static per (subdivision level, texel window, mip chain); the jit
cache is keyed accordingly.  Blocks of micro-triangles are processed with
lax.map to bound peak memory at any subdivision level.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bird, geom
from ..texture import Texture
from ..types import OpacityState, get_num_micro_triangles
from .levelline import (conservative_raster_mask, get_state_from_coverage,
                        level_line_texel_kernel, make_tri_params)

UO = int(OpacityState.UnknownOpaque)
BLOCK = 8192  # micro-triangles per lax.map block


def _dev_planes(texture: Texture):
    """Device-resident mip planes, cached on the texture (same
    `_omm_dev_cache` dict the two-phase engine uses): textures are
    reused across many work items, and re-uploading the full mip chain
    per item made every slow-path item pay an H2D of the texture."""
    c = getattr(texture, "_omm_dev_cache", None)
    if c is None:
        c = {}
        texture._omm_dev_cache = c
    t = c.get("raw_planes")
    if t is None:
        t = c["raw_planes"] = tuple(jnp.asarray(texture.load_plane(m))
                                    for m in range(texture.mip_count))
    return t


def _bilinear_seed(plane, p, size, size_log2, is_pow2, addr_mode,
                   border_alpha, fz=None):
    """Runtime bilinear at UV p (..., 2) on device (texture_impl.cpp:261-278)."""
    from ..texture import gather_tex_coord4
    from .levelline import guard as _g
    sizef = jnp.asarray(np.array(size, dtype=np.float32))
    pixel = _g(jnp, p * sizef, fz) - jnp.float32(0.5)
    pf = jnp.floor(pixel)
    c00, c10, c01, c11 = gather_tex_coord4(
        addr_mode, pf.astype(jnp.int32), np.array(size, np.int32),
        np.array(size_log2, np.int32), is_pow2, jnp)
    w_i = np.int32(size[0])
    h_i = np.int32(size[1])

    def load(cc):
        cx = jnp.clip(cc[..., 0], 0, w_i - 1)
        cy = jnp.clip(cc[..., 1], 0, h_i - 1)
        return plane[cy, cx]

    a = load(c00)
    b = load(c01)
    c = load(c10)
    d = load(c11)
    w = pixel - jnp.floor(pixel)
    one = jnp.float32(1.0)
    from .levelline import guard
    ac = guard(jnp, a * (one - w[..., 0]), fz) + guard(jnp, c * w[..., 0], fz)
    bd = guard(jnp, b * (one - w[..., 0]), fz) + guard(jnp, d * w[..., 0], fz)
    return (guard(jnp, ac * (one - w[..., 1]), fz)
            + guard(jnp, bd * w[..., 1], fz))


@partial(jax.jit, static_argnames=(
    "subdiv", "addr_mode", "alpha_cutoff", "border_alpha", "mip_meta",
    "win_wh", "fmt", "promotion", "cutoff_gt", "cutoff_le"))
def _classify_item(planes, uv_tri, ccw_flag, fz, *, subdiv, addr_mode,
                   alpha_cutoff, border_alpha, mip_meta, win_wh, fmt,
                   promotion, cutoff_gt, cutoff_le):
    """Level-line fine pass over all mips for one work item on device.

    planes: tuple of (h, w) fp32 mip planes.
    mip_meta: tuple of (size, size_log2, is_pow2, rcp) per mip (static).
    win_wh: tuple of (W, H) texel window bounds per mip (static).
    Returns (above, below) int32 (M,).
    """
    M = get_num_micro_triangles(subdiv)
    idx = jnp.arange(M, dtype=jnp.uint32)
    muvs = bird.micro_triangle_uvs(jnp.asarray(uv_tri, jnp.float32), idx,
                                   subdiv, xp=jnp, fz=fz)  # (M, 3, 2)

    above = jnp.zeros(M, dtype=jnp.int32)
    below = jnp.zeros(M, dtype=jnp.int32)
    alive = jnp.ones(M, dtype=bool)

    for mip, (size, size_log2, is_pow2, rcp) in enumerate(mip_meta):
        W, H = win_wh[mip]
        plane = planes[mip]

        def block_fn(args, _W=W, _H=H, _plane=plane, _size=size,
                     _log2=size_log2, _pow2=is_pow2, _rcp=rcp):
            muv = args  # (B, 3, 2)
            seed = _bilinear_seed(_plane, muv[:, 0, :], _size, _log2, _pow2,
                                  addr_mode, border_alpha, fz)
            seed_above = jnp.float32(alpha_cutoff) < seed

            from .levelline import guard as _gq
            rf = jnp.asarray(np.array(_size, dtype=np.float32))
            q = _gq(jnp, muv * rf, fz) + jnp.float32(-0.5)
            qn = jnp.where(ccw_flag, q, q[:, ::-1, :])
            amin = qn.min(axis=-2)
            amax = qn.max(axis=-2)
            ix0 = jnp.floor(amin[:, 0]).astype(jnp.int32)
            iy0 = jnp.floor(amin[:, 1]).astype(jnp.int32)
            ix1 = jnp.ceil(amax[:, 0]).astype(jnp.int32)
            iy1 = jnp.ceil(amax[:, 1]).astype(jnp.int32)
            x = ix0[:, None, None] + jnp.arange(_W, dtype=jnp.int32)[None, None, :]
            y = iy0[:, None, None] + jnp.arange(_H, dtype=jnp.int32)[None, :, None]
            inb = (x < ix1[:, None, None]) & (y < iy1[:, None, None])
            B = muv.shape[0]
            x = jnp.broadcast_to(x, (B, _H, _W))
            y = jnp.broadcast_to(y, (B, _H, _W))
            mask = inb & conservative_raster_mask(jnp, qn, x, y, fz)

            tp = make_tri_params(jnp, muv)
            a_inc, b_inc = level_line_texel_kernel(
                jnp, muv, tp, x, y, _plane, _size, _log2, _pow2,
                rcp, addr_mode, alpha_cutoff, border_alpha, degenerate=False,
                fz=fz)
            zero = jnp.int32(0)
            a = jnp.where(mask, a_inc, zero).sum(axis=(-1, -2),
                                                 dtype=jnp.int32)
            b = jnp.where(mask, b_inc, zero).sum(axis=(-1, -2),
                                                 dtype=jnp.int32)
            a = a + seed_above.astype(jnp.int32)
            b = b + (~seed_above).astype(jnp.int32)
            return a, b

        if M <= BLOCK:
            a_inc, b_inc = block_fn(muvs)
        else:
            nblk = (M + BLOCK - 1) // BLOCK
            pad = nblk * BLOCK - M
            muvs_p = jnp.pad(muvs, ((0, pad), (0, 0), (0, 0)))
            a_inc, b_inc = jax.lax.map(block_fn,
                                       muvs_p.reshape(nblk, BLOCK, 3, 2))
            a_inc = a_inc.reshape(-1)[:M]
            b_inc = b_inc.reshape(-1)[:M]

        above = above + jnp.where(alive, a_inc, 0)
        below = below + jnp.where(alive, b_inc, 0)
        if len(mip_meta) > 1:
            st = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                         cutoff_le, above, below)
            unknown = (st == UO) | (st == int(OpacityState.UnknownTransparent))
            alive = alive & ~unknown
    return above, below


def _window_bounds(texture: Texture, uv_tri: np.ndarray, subdiv: int):
    """Static per-mip (W, H) texel window bounds for a work item, from
    host-side micro-triangle AABBs."""
    M = get_num_micro_triangles(subdiv)
    idx = np.arange(M, dtype=np.uint32)
    muvs = bird.micro_triangle_uvs(uv_tri, idx, subdiv)
    out = []
    for mip in range(texture.mip_count):
        rf = np.array(texture.size(mip), dtype=np.float32)
        q = muvs * rf + np.float32(-0.5)
        amin = q.min(axis=-2)
        amax = q.max(axis=-2)
        W = int(np.max(np.ceil(amax[:, 0]).astype(np.int64)
                       - np.floor(amin[:, 0]).astype(np.int64)))
        H = int(np.max(np.ceil(amax[:, 1]).astype(np.int64)
                       - np.floor(amin[:, 1]).astype(np.int64)))
        out.append((W, H))
    return tuple(out)


def classify_work_item_device(texture: Texture, cfg, uv_tri: np.ndarray,
                              subdiv: int, states: np.ndarray) -> np.ndarray:
    """Device fine-pass: MXU one-hot-matmul engine when its fast-path
    preconditions hold (kernels/mxu_classify.py), XLA-gather path
    otherwise.  Both are bit-exact with the numpy oracle."""
    from .mxu_classify import classify_work_item_mxu
    out = classify_work_item_mxu(texture, cfg, uv_tri, subdiv, states)
    if out is not None:
        return out
    return classify_work_item_jax(texture, cfg, uv_tri, subdiv, states)


def classify_work_item_jax(texture: Texture, cfg, uv_tri: np.ndarray,
                           subdiv: int, states: np.ndarray) -> np.ndarray:
    """Drop-in fine-pass for the jax backend (linear filter,
    non-degenerate).  Returns updated states."""
    active = states == UO
    if not active.any():
        return states

    if not bool(geom.winding_stable(uv_tri, subdiv)):
        # fp32-thin sliver: the dense path's per-ITEM winding shortcut is
        # unproven here — classify through the per-micro-triangle-winding
        # survivors kernel instead (the oracle's exact op order)
        return classify_linear_survivors(texture, cfg, uv_tri, subdiv,
                                         states)

    ccw = bool(geom.is_ccw(uv_tri))
    planes = _dev_planes(texture)
    mip_meta = tuple(
        (texture.info[m].size, texture.info[m].size_log2,
         texture.info[m].is_pow2,
         (float(texture.info[m].rcp_size[0]),
          float(texture.info[m].rcp_size[1])))
        for m in range(texture.mip_count))
    # pow2-bucket the static window bounds: exact per-item (W, H) would
    # key a fresh jit signature per distinct window — minutes per compile
    # on a remote device — for identical results (the in-bounds mask
    # drops the padded texels; extra columns are dead compute only)
    win = tuple((max(_bucket_pow2(W), 2), max(_bucket_pow2(H), 2))
                for W, H in _window_bounds(texture, uv_tri, subdiv))

    above, below = _classify_item(
        planes, jnp.asarray(uv_tri, jnp.float32), jnp.asarray(ccw),
        jnp.int32(0), subdiv=subdiv, addr_mode=cfg.addr_mode,
        alpha_cutoff=float(cfg.alpha_cutoff),
        border_alpha=float(cfg.border_alpha), mip_meta=mip_meta, win_wh=win,
        fmt=cfg.fmt, promotion=cfg.promotion, cutoff_gt=cfg.cutoff_gt,
        cutoff_le=cfg.cutoff_le)
    above = np.asarray(above)
    below = np.asarray(below)

    # Multi-mip early-break parity: the device path accumulates with the
    # same alive-masking as the reference per-mip loop.
    from .levelline import get_state_from_coverage as gsc
    final = gsc(np, cfg.fmt, cfg.promotion, cfg.cutoff_gt, cfg.cutoff_le,
                above, below)
    out = states.copy()
    out[active] = final[active].astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# nearest-filter survivors (device pass over the active micro-triangles)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "addr_mode", "alpha_cutoff", "border_alpha", "mip_meta", "win_wh",
    "fmt", "promotion", "cutoff_gt", "cutoff_le"))
def _classify_nearest(planes, muvs, ccw, fz, *, addr_mode, alpha_cutoff,
                      border_alpha, mip_meta, win_wh, fmt, promotion,
                      cutoff_gt, cutoff_le):
    """Nearest-filter fine pass over a compacted micro-triangle set
    (engine._nearest_mip_pass semantics, bake_cpu_impl.cpp:969-1022):
    conservative raster with zero offset over [floor(min q), ceil(max q)),
    one texel load per covered cell, no seed sample.  Mip accumulation
    uses the reference's early-unknown-exit alive-masking.  Returns
    (above, below) int32 (S,)."""
    from ..texture import TEXCOORD_BORDER, get_tex_coord
    from ..types import TextureAddressMode
    from .levelline import get_state_from_coverage
    from .levelline import guard as _g

    S = muvs.shape[0]
    above = jnp.zeros(S, dtype=jnp.int32)
    below = jnp.zeros(S, dtype=jnp.int32)
    alive = jnp.ones(S, dtype=bool)
    border = addr_mode == int(TextureAddressMode.Border) \
        or addr_mode == TextureAddressMode.Border

    for mip, (size, size_log2, is_pow2, _rcp) in enumerate(mip_meta):
        W, H = win_wh[mip]
        plane = planes[mip]
        rf = jnp.asarray(np.array(size, dtype=np.float32))
        q = _g(jnp, muvs * rf, fz)
        qn = jnp.where(ccw[:, None, None], q, q[:, ::-1, :])
        amin = qn.min(axis=-2)
        amax = qn.max(axis=-2)
        ix0 = jnp.floor(amin[:, 0]).astype(jnp.int32)
        iy0 = jnp.floor(amin[:, 1]).astype(jnp.int32)
        ix1 = jnp.ceil(amax[:, 0]).astype(jnp.int32)
        iy1 = jnp.ceil(amax[:, 1]).astype(jnp.int32)
        x = ix0[:, None, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
        y = iy0[:, None, None] + jnp.arange(H, dtype=jnp.int32)[None, :, None]
        inb = (x < ix1[:, None, None]) & (y < iy1[:, None, None])
        x = jnp.broadcast_to(x, (S, H, W))
        y = jnp.broadcast_to(y, (S, H, W))
        mask = inb & conservative_raster_mask(jnp, qn, x, y, fz)

        coord = get_tex_coord(addr_mode, jnp.stack([x, y], axis=-1),
                              np.array(size, np.int32),
                              np.array(size_log2, np.int32), is_pow2, jnp)
        if border:
            isb = (coord[..., 0] == TEXCOORD_BORDER) \
                | (coord[..., 1] == TEXCOORD_BORDER)
            safe = jnp.where(isb[..., None], 0, coord)
            alpha = plane[safe[..., 1], safe[..., 0]]
            alpha = jnp.where(isb, jnp.float32(border_alpha), alpha)
        else:
            alpha = plane[coord[..., 1], coord[..., 0]]
        above_t = jnp.float32(alpha_cutoff) < alpha
        zero = jnp.int32(0)
        one = jnp.int32(1)
        a_inc = jnp.where(mask & above_t, one, zero).sum(
            axis=(-1, -2), dtype=jnp.int32)
        b_inc = jnp.where(mask & ~above_t, one, zero).sum(
            axis=(-1, -2), dtype=jnp.int32)
        above = above + jnp.where(alive, a_inc, zero)
        below = below + jnp.where(alive, b_inc, zero)
        if len(mip_meta) > 1:
            st = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                         cutoff_le, above, below)
            unknown = (st == UO) \
                | (st == int(OpacityState.UnknownTransparent))
            alive = alive & ~unknown
    return above, below


def classify_nearest_survivors(texture: Texture, cfg, uv_tri: np.ndarray,
                               subdiv: int, states: np.ndarray) -> np.ndarray:
    """Device fine-pass for nearest-filter work items, processing ONLY the
    micro-triangles still UnknownOpaque (the contour survivors left by
    kernels/twophase.resolve_nearest_phase1).  Compacted on host, padded
    to power-of-two buckets to bound the jit cache, classified densely on
    device, scattered back.  Bit-exact with engine.resample_fine_item
    (nearest branch)."""
    sel = np.flatnonzero(states == UO)
    if sel.size == 0:
        return states

    muvs_all = bird.micro_triangle_uvs(uv_tri, sel.astype(np.uint32),
                                       subdiv)  # (S, 3, 2) fp32
    planes = _dev_planes(texture)
    mip_meta = tuple(
        (texture.info[m].size, texture.info[m].size_log2,
         texture.info[m].is_pow2,
         (float(texture.info[m].rcp_size[0]),
          float(texture.info[m].rcp_size[1])))
        for m in range(texture.mip_count))

    out = states.copy()
    from .levelline import get_state_from_coverage as gsc
    for lo in range(0, sel.size, BLOCK):
        block = sel[lo:lo + BLOCK]
        muvs = muvs_all[lo:lo + BLOCK]
        ccw = geom.is_ccw(muvs)

        # static window bounds (zero-offset footprint), padded buckets
        win = []
        for m in range(texture.mip_count):
            rf = np.array(texture.size(m), dtype=np.float32)
            q = muvs.astype(np.float32) * rf
            W = int(np.max(np.ceil(q[..., 0].max(axis=-1))
                           - np.floor(q[..., 0].min(axis=-1))))
            H = int(np.max(np.ceil(q[..., 1].max(axis=-1))
                           - np.floor(q[..., 1].min(axis=-1))))
            win.append((max(_bucket_pow2(W), 2), max(_bucket_pow2(H), 2)))
        Sp = _bucket_pow2(len(block))
        if Sp > len(block):  # pad with row 0 (valid geometry, dropped)
            padrows = np.broadcast_to(muvs[:1], (Sp - len(block), 3, 2))
            muvs = np.concatenate([muvs, padrows])
            ccw = np.concatenate([ccw, np.broadcast_to(ccw[:1],
                                                       (Sp - len(block),))])

        above, below = _classify_nearest(
            planes, jnp.asarray(muvs, jnp.float32), jnp.asarray(ccw),
            jnp.int32(0), addr_mode=cfg.addr_mode,
            alpha_cutoff=float(cfg.alpha_cutoff),
            border_alpha=float(cfg.border_alpha), mip_meta=mip_meta,
            win_wh=tuple(win), fmt=cfg.fmt, promotion=cfg.promotion,
            cutoff_gt=cfg.cutoff_gt, cutoff_le=cfg.cutoff_le)
        above = np.asarray(above)[:len(block)]
        below = np.asarray(below)[:len(block)]
        final = gsc(np, cfg.fmt, cfg.promotion, cfg.cutoff_gt,
                    cfg.cutoff_le, above, below)
        out[block] = np.asarray(final, dtype=np.uint8)
    return out


def _bucket_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


# ---------------------------------------------------------------------------
# linear-filter survivors (device pass over the active micro-triangles)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "addr_mode", "alpha_cutoff", "border_alpha", "mip_meta", "win_wh",
    "fmt", "promotion", "cutoff_gt", "cutoff_le"))
def _classify_linear(planes, muvs, ccw, fz, *, addr_mode, alpha_cutoff,
                     border_alpha, mip_meta, win_wh, fmt, promotion,
                     cutoff_gt, cutoff_le):
    """Linear-filter level-line fine pass over a compacted micro-triangle
    set: the same per-mip ops, in the same fp32 order, as
    `_classify_item`'s dense block (bilinear seed, conservative raster
    mask, level-line texel kernel, early-unknown-exit mip accumulation) —
    but over (S, 3, 2) survivor corners instead of all 4^N.  Returns
    (above, below) int32 (S,)."""
    from .levelline import guard as _gq

    S = muvs.shape[0]
    above = jnp.zeros(S, dtype=jnp.int32)
    below = jnp.zeros(S, dtype=jnp.int32)
    alive = jnp.ones(S, dtype=bool)

    for mip, (size, size_log2, is_pow2, rcp) in enumerate(mip_meta):
        W, H = win_wh[mip]
        plane = planes[mip]
        seed = _bilinear_seed(plane, muvs[:, 0, :], size, size_log2,
                              is_pow2, addr_mode, border_alpha, fz)
        seed_above = jnp.float32(alpha_cutoff) < seed

        rf = jnp.asarray(np.array(size, dtype=np.float32))
        q = _gq(jnp, muvs * rf, fz) + jnp.float32(-0.5)
        qn = jnp.where(ccw[:, None, None], q, q[:, ::-1, :])
        amin = qn.min(axis=-2)
        amax = qn.max(axis=-2)
        ix0 = jnp.floor(amin[:, 0]).astype(jnp.int32)
        iy0 = jnp.floor(amin[:, 1]).astype(jnp.int32)
        ix1 = jnp.ceil(amax[:, 0]).astype(jnp.int32)
        iy1 = jnp.ceil(amax[:, 1]).astype(jnp.int32)
        x = ix0[:, None, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
        y = iy0[:, None, None] + jnp.arange(H, dtype=jnp.int32)[None, :, None]
        inb = (x < ix1[:, None, None]) & (y < iy1[:, None, None])
        x = jnp.broadcast_to(x, (S, H, W))
        y = jnp.broadcast_to(y, (S, H, W))
        mask = inb & conservative_raster_mask(jnp, qn, x, y, fz)

        tp = make_tri_params(jnp, muvs)
        a_inc, b_inc = level_line_texel_kernel(
            jnp, muvs, tp, x, y, plane, size, size_log2, is_pow2,
            rcp, addr_mode, alpha_cutoff, border_alpha, degenerate=False,
            fz=fz)
        zero = jnp.int32(0)
        a = jnp.where(mask, a_inc, zero).sum(axis=(-1, -2),
                                             dtype=jnp.int32)
        b = jnp.where(mask, b_inc, zero).sum(axis=(-1, -2),
                                             dtype=jnp.int32)
        a = a + seed_above.astype(jnp.int32)
        b = b + (~seed_above).astype(jnp.int32)

        above = above + jnp.where(alive, a, zero)
        below = below + jnp.where(alive, b, zero)
        if len(mip_meta) > 1:
            st = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                         cutoff_le, above, below)
            unknown = (st == UO) \
                | (st == int(OpacityState.UnknownTransparent))
            alive = alive & ~unknown
    return above, below


def classify_linear_survivors_batch(texture: Texture, cfg, work,
                                    subdiv: int) -> list:
    """Batched device fine-pass for linear-filter work items, processing
    ONLY the micro-triangles still UnknownOpaque (e.g. the contour
    survivors left by kernels/twophase.resolve_linear_phase1, or a
    resumed partial bake).  work: list of (uv_tri, states); returns the
    new state list.

    The survivors of ALL items are compacted into ONE stream and
    classified in BLOCK-sized dispatches that are ALL enqueued before
    any result fetch, so device dispatch count (and the fixed ~26.5 ms
    tunnel dispatch+fetch cycle) scales with total contour size, not
    with item count — the per-item form paid one cycle per work item,
    which is what made the round-5 ComputeOnly capture (3.9M µtri/s)
    link-bound rather than compute-bound.  Bit-exact with the per-item
    form and with engine.resample_fine_item (linear branch): every
    per-micro-triangle value in _classify_linear is independent of its
    block's composition (windows are conservative static bounds whose
    extra texels are masked out of the coverage sums)."""
    from .levelline import get_state_from_coverage as gsc

    outs = []
    seg_muvs = []   # per contributing item: (S_i, 3, 2) survivor corners
    seg_owner = []  # per contributing item: (index into outs, sel)
    for i, (uv_tri, states) in enumerate(work):
        sel = np.flatnonzero(states == UO)
        if sel.size == 0:
            outs.append(states)
            continue
        if sel.size >= states.shape[0] \
                and bool(geom.winding_stable(uv_tri, subdiv)):
            # nothing resolved yet: the dense path's (M-block, window)
            # jit signatures are already warm in any mixed workload.
            # (Winding-unstable slivers must NOT bounce back —
            # classify_work_item_jax routes them here.)
            outs.append(classify_work_item_jax(texture, cfg, uv_tri,
                                               subdiv, states))
            continue
        outs.append(states.copy())
        seg_muvs.append(bird.micro_triangle_uvs(
            uv_tri, sel.astype(np.uint32), subdiv))
        seg_owner.append((i, sel))
    if not seg_muvs:
        return outs

    muvs_all = np.concatenate(seg_muvs)  # (S_total, 3, 2) fp32
    planes = _dev_planes(texture)
    mip_meta = tuple(
        (texture.info[m].size, texture.info[m].size_log2,
         texture.info[m].is_pow2,
         (float(texture.info[m].rcp_size[0]),
          float(texture.info[m].rcp_size[1])))
        for m in range(texture.mip_count))

    # dispatch every block before fetching any result (async enqueue:
    # block k's device execute overlaps block k+1's host prep, and the
    # fetch loop below drains an already-computed stream)
    devs = []
    for lo in range(0, muvs_all.shape[0], BLOCK):
        muvs = muvs_all[lo:lo + BLOCK]
        n = muvs.shape[0]

        # static window bounds (seed/kernel -0.5 offset footprint),
        # pow2-bucketed like classify_work_item_jax's
        win = []
        for m in range(texture.mip_count):
            rf = np.array(texture.size(m), dtype=np.float32)
            q = muvs.astype(np.float32) * rf + np.float32(-0.5)
            W = int(np.max(np.ceil(q[..., 0].max(axis=-1))
                           - np.floor(q[..., 0].min(axis=-1))))
            H = int(np.max(np.ceil(q[..., 1].max(axis=-1))
                           - np.floor(q[..., 1].min(axis=-1))))
            win.append((max(_bucket_pow2(W), 2), max(_bucket_pow2(H), 2)))
        Sp = _bucket_pow2(n)
        # per-micro-triangle float64 winding — the oracle's exact op
        # order (engine.resample_fine_item: is_ccw(micro_uvs)); the
        # macro triangle's winding can disagree on fp32-thin slivers
        ccw = geom.is_ccw(muvs)
        if Sp > n:  # pad with row 0 (valid geometry, dropped)
            padrows = np.broadcast_to(muvs[:1], (Sp - n, 3, 2))
            muvs = np.concatenate([muvs, padrows])
            ccw = np.concatenate([ccw, np.broadcast_to(ccw[:1],
                                                       (Sp - n,))])

        above, below = _classify_linear(
            planes, jnp.asarray(muvs, jnp.float32), jnp.asarray(ccw),
            jnp.int32(0), addr_mode=cfg.addr_mode,
            alpha_cutoff=float(cfg.alpha_cutoff),
            border_alpha=float(cfg.border_alpha), mip_meta=mip_meta,
            win_wh=tuple(win), fmt=cfg.fmt, promotion=cfg.promotion,
            cutoff_gt=cfg.cutoff_gt, cutoff_le=cfg.cutoff_le)
        devs.append((above, below, n))

    # ONE fetch for the whole stream: the per-block trims + concats are
    # eager device ops (async enqueues, no fixed-cost cycle); fetching
    # per block paid the ~26.5 ms tunnel dispatch+fetch cycle per block
    # (measured 1264 ms for a 19-block ComputeOnly batch, ~80% of it
    # fetch cycles).  gsc is elementwise, so running it over the
    # concatenated stream is bit-identical to per-block.
    if len(devs) == 1:
        a_all = np.asarray(devs[0][0])[:devs[0][2]]
        b_all = np.asarray(devs[0][1])[:devs[0][2]]
    else:
        a_all = np.asarray(jnp.concatenate([a[:n] for a, _, n in devs]))
        b_all = np.asarray(jnp.concatenate([b[:n] for _, b, n in devs]))
    flat = np.asarray(
        gsc(np, cfg.fmt, cfg.promotion, cfg.cutoff_gt, cfg.cutoff_le,
            a_all, b_all), dtype=np.uint8)
    o = 0
    for i, sel in seg_owner:
        outs[i][sel] = flat[o:o + sel.size]
        o += sel.size
    return outs


def classify_linear_survivors(texture: Texture, cfg, uv_tri: np.ndarray,
                              subdiv: int, states: np.ndarray) -> np.ndarray:
    """Single-item wrapper over classify_linear_survivors_batch (the
    historical entry point; batch-of-one shares its jit signatures)."""
    return classify_linear_survivors_batch(
        texture, cfg, [(uv_tri, states)], subdiv)[0]


# ---------------------------------------------------------------------------
# degenerate (line) triangles: host DDA schedule, device exact kernel
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "addr_mode", "alpha_cutoff", "border_alpha", "mip_meta",
    "fmt", "promotion", "cutoff_gt", "cutoff_le"))
def _classify_degenerate(planes, muvs, aabb_s, aabb_e, xs, ys, masks, fz, *,
                         addr_mode, alpha_cutoff, border_alpha, mip_meta,
                         fmt, promotion, cutoff_gt, cutoff_le):
    """Degenerate (line) level-line pass on device
    (bake_cpu_impl.cpp:896-904 semantics, engine._degenerate_mip_pass op
    order): the sequential DDA walks are precomputed on host into padded
    (S, K) cell lists; the exact per-cell kernel (AABB-diagonal
    edge-vs-hyperbola variant) and the seed bilinear run on device.
    Mip accumulation uses the reference's early-unknown-exit masking.
    Returns (above, below) int32 (S,)."""
    from .levelline import get_state_from_coverage

    S = muvs.shape[0]
    above = jnp.zeros(S, jnp.int32)
    below = jnp.zeros(S, jnp.int32)
    alive = jnp.ones(S, bool)
    zero = jnp.int32(0)
    for mip, (size, size_log2, is_pow2, rcp) in enumerate(mip_meta):
        plane = planes[mip]
        seed = _bilinear_seed(plane, muvs[:, 0, :], size, size_log2,
                              is_pow2, addr_mode, border_alpha, fz)
        sa = jnp.float32(alpha_cutoff) < seed
        x, y, m = xs[mip], ys[mip], masks[mip]
        a_inc, b_inc = level_line_texel_kernel(
            jnp, muvs, make_tri_params(jnp, muvs), x[:, :, None],
            y[:, :, None], plane, size, size_log2, is_pow2, rcp,
            addr_mode, alpha_cutoff, border_alpha, degenerate=True,
            aabb_s=aabb_s, aabb_e=aabb_e, fz=fz)
        m3 = m[:, :, None]
        a = (jnp.where(m3, a_inc, zero).sum(axis=(-1, -2), dtype=jnp.int32)
             + sa.astype(jnp.int32))
        b = (jnp.where(m3, b_inc, zero).sum(axis=(-1, -2), dtype=jnp.int32)
             + (~sa).astype(jnp.int32))
        above = above + jnp.where(alive, a, zero)
        below = below + jnp.where(alive, b, zero)
        if len(mip_meta) > 1:
            st = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                         cutoff_le, above, below)
            unknown = (st == UO) \
                | (st == int(OpacityState.UnknownTransparent))
            alive = alive & ~unknown
    return above, below


def classify_degenerate_device(texture: Texture, cfg, uv_tri: np.ndarray,
                               subdiv: int, states: np.ndarray) -> np.ndarray:
    """Device fine-pass for degenerate (line) work items: the short
    sequential DDA cell walks stay on host (kernels/raster.py), padded to
    fixed shape; the exact level-line kernel runs on device over
    (micro-tri, cell).  Bit-exact with engine.resample_fine_item's
    degenerate branch."""
    from .raster import conservative_line_cells_batch
    from .levelline import get_state_from_coverage as gsc

    sel = np.flatnonzero(states == UO)
    if sel.size == 0:
        return states

    muvs_all = bird.micro_triangle_uvs(uv_tri, sel.astype(np.uint32),
                                       subdiv)  # (S, 3, 2) fp32
    planes = _dev_planes(texture)
    mip_meta = tuple(
        (texture.info[m].size, texture.info[m].size_log2,
         texture.info[m].is_pow2,
         (float(texture.info[m].rcp_size[0]),
          float(texture.info[m].rcp_size[1])))
        for m in range(texture.mip_count))

    out = states.copy()
    for lo in range(0, sel.size, BLOCK):
        block = sel[lo:lo + BLOCK]
        muvs = muvs_all[lo:lo + BLOCK]
        aabb_s, aabb_e = geom.tri_aabb(muvs)

        # host DDA schedules per mip, K and S padded to pow2 buckets to
        # bound the jit cache
        Sp = _bucket_pow2(len(block))
        xs, ys, masks = [], [], []
        for m in range(texture.mip_count):
            w, h = texture.size(m)
            x, y, msk = conservative_line_cells_batch(
                aabb_s, aabb_e, (w, h), (-0.5, -0.5))
            K = max(_bucket_pow2(x.shape[1]), 2)
            x = np.pad(x, ((0, Sp - len(block)), (0, K - x.shape[1])))
            y = np.pad(y, ((0, Sp - len(block)), (0, K - y.shape[1])))
            msk = np.pad(msk, ((0, Sp - len(block)), (0, K - msk.shape[1])))
            xs.append(jnp.asarray(x))
            ys.append(jnp.asarray(y))
            masks.append(jnp.asarray(msk))
        if Sp > len(block):  # pad rows with row-0 geometry (dropped)
            padrows = np.broadcast_to(muvs[:1], (Sp - len(block), 3, 2))
            muvs = np.concatenate([muvs, padrows])
            aabb_s = np.concatenate(
                [aabb_s, np.broadcast_to(aabb_s[:1], (Sp - len(block), 2))])
            aabb_e = np.concatenate(
                [aabb_e, np.broadcast_to(aabb_e[:1], (Sp - len(block), 2))])

        above, below = _classify_degenerate(
            planes, jnp.asarray(muvs, jnp.float32),
            jnp.asarray(aabb_s, jnp.float32), jnp.asarray(aabb_e, jnp.float32),
            tuple(xs), tuple(ys), tuple(masks), jnp.int32(0),
            addr_mode=cfg.addr_mode, alpha_cutoff=float(cfg.alpha_cutoff),
            border_alpha=float(cfg.border_alpha), mip_meta=mip_meta,
            fmt=cfg.fmt, promotion=cfg.promotion, cutoff_gt=cfg.cutoff_gt,
            cutoff_le=cfg.cutoff_le)
        above = np.asarray(above)[:len(block)]
        below = np.asarray(below)[:len(block)]
        final = gsc(np, cfg.fmt, cfg.promotion, cfg.cutoff_gt,
                    cfg.cutoff_le, above, below)
        out[block] = np.asarray(final, dtype=np.uint8)
    return out
