"""MXU classification path: texel-window gathers as one-hot matmuls.

XLA's per-element gather costs ~20 cycles/element on TPU, and the
level-line kernel needs ~40 texel fetches per micro-triangle — gathers
dominate the jax gather path.  This engine removes them entirely:

  1. Micro-triangles are processed in blocks of B consecutive bird-curve
     indices; the curve is space-filling, so a block's texel windows live
     in a compact region of the texture.
  2. Per block, the region (RH x RW texels) is sliced from a wrap-mode
     pre-padded plane (one dynamic slice; no per-element addressing).
  3. The per-micro-tri (H+2)x(W+2) texel windows are gathered from the
     region with ONE matmul:  windows[k, i] = sum_f S[k, f] * onehot[f, i]
     where S stacks the (H+2)(W+2) statically-shifted flattenings of the
     region and onehot encodes each micro-tri's window origin.  The matmul
     runs on the MXU; with one exact-0/1 operand and HIGHEST precision the
     gathered values are bit-exact f32.
  4. The level-line math runs in (HW, B) layout — micro-tris along lanes —
     via the shared level_line_values_kernel, so fp32 op order matches the
     numpy oracle exactly.

This is the conservative-raster-as-matmul formulation anticipated in
SURVEY.md §7 step 4 ("stage tile in VMEM, iterate µtris intersecting the
tile"), expressed in pure XLA.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bird, geom
from ..texture import Texture, get_tex_coord
from ..types import (OpacityState, TextureAddressMode, get_num_micro_triangles)
from .levelline import (get_state_from_coverage, level_line_values_kernel)

UO = int(OpacityState.UnknownOpaque)

BLOCK_CANDIDATES = (512, 256, 128, 64)  # adaptive micro-tris per block
MAX_REGION = 64       # fallback threshold for region edge (texels)


def padded_plane(texture: Texture, mip: int, pad: int,
                 addr_mode: TextureAddressMode,
                 border_alpha: float = 0.0,
                 period: tuple | None = None) -> np.ndarray:
    """Plane extended by `pad` texels on each side with the address mode's
    wrapped texels, so any load with coords in [-pad, size+pad) is a plain
    in-bounds read (replaces per-texel GetTexCoord in the hot loop).

    Border mode fills the pad with border_alpha — the exact value the
    reference's kernels substitute for the kTexCoordBorder sentinel
    (util/texture.h:21-91; kernels read alpha values only, so value-level
    substitution is bit-exact).

    period=(Pw, Ph): build the PERIODIC plane over [-pad, P+pad) per axis
    — one full address-mode period (w for Wrap, 2w for Mirror) plus the
    apron, extended by the true periodic continuation.  Window lookups
    whose origin is wrapped modulo the period then read the same texel
    values the reference's per-texel GetTexCoord (texture.h:34-91) yields
    at the UNwrapped coordinate, for any UV repeat count.  (For pow2
    textures GetTexCoord itself is exactly periodic including the
    negative-coordinate uint32-cast quirk; for non-pow2 Wrap the quirk is
    aperiodic at negative coords, so the fast-path mask keeps
    negative-footprint items off this plane.)"""
    plane = texture.load_plane(mip)
    w, h = texture.size(mip)
    info = texture.info[mip]
    if addr_mode == TextureAddressMode.Border:
        out = np.full((h + 2 * pad, w + 2 * pad), np.float32(border_alpha),
                      dtype=np.float32)
        out[pad:pad + h, pad:pad + w] = plane
        return out
    if period is not None:
        Pw, Ph = period
        cx = np.mod(np.arange(-pad, Pw + pad, dtype=np.int64),
                    Pw).astype(np.int32)
        cy = np.mod(np.arange(-pad, Ph + pad, dtype=np.int64),
                    Ph).astype(np.int32)
    else:
        cx = np.arange(-pad, w + pad, dtype=np.int32)
        cy = np.arange(-pad, h + pad, dtype=np.int32)
    wx = get_tex_coord(addr_mode, np.stack([cx, np.zeros_like(cx)], -1),
                       np.array([w, h], np.int32),
                       np.array(info.size_log2, np.int32), info.is_pow2)[:, 0]
    wy = get_tex_coord(addr_mode, np.stack([np.zeros_like(cy), cy], -1),
                       np.array([w, h], np.int32),
                       np.array(info.size_log2, np.int32), info.is_pow2)[:, 1]
    return plane[np.ix_(wy, wx)]


def _padded_plane_cached(texture: Texture, mip: int, pad: int, addr_mode,
                         border_alpha: float):
    """Device-resident padded plane cached on the texture (the dict the
    two-phase engine and _dev_planes share): without it every slow-path
    work item re-uploaded the whole mip over the tunnel."""
    c = getattr(texture, "_omm_dev_cache", None)
    if c is None:
        c = {}
        texture._omm_dev_cache = c
    key = ("mxu_plane", mip, int(addr_mode), int(pad), float(border_alpha))
    if key not in c:
        c[key] = jnp.asarray(padded_plane(texture, mip, pad, addr_mode,
                                          border_alpha))
    return c[key]


def _host_precompute(texture: Texture, uv_tri: np.ndarray, subdiv: int,
                     mip: int, candidates=BLOCK_CANDIDATES, muv=None):
    """Window origins, extents and block regions (host numpy).  The block
    size adapts: consecutive bird-curve micro-tris are grouped into the
    largest block whose texel region stays under MAX_REGION.  `muv` is
    mip-independent — callers with a mip loop pass it in once (its bird
    evaluation over all 4^N micro-tris dominates this function)."""
    M = get_num_micro_triangles(subdiv)
    if muv is None:
        idx = np.arange(M, dtype=np.uint32)
        muv = bird.micro_triangle_uvs(uv_tri, idx, subdiv)  # (M,3,2) fp32
    w, h = texture.size(mip)
    rf = np.array([w, h], dtype=np.float32)
    q = muv * rf + np.float32(-0.5)
    amin = q.min(axis=-2)
    amax = q.max(axis=-2)
    x0 = np.floor(amin[:, 0]).astype(np.int32)
    y0 = np.floor(amin[:, 1]).astype(np.int32)
    x1 = np.ceil(amax[:, 0]).astype(np.int32)
    y1 = np.ceil(amax[:, 1]).astype(np.int32)
    W = int((x1 - x0).max())
    H = int((y1 - y0).max())

    # seed (bilinear at p0) base texel
    p0pix = muv[:, 0, :] * rf - np.float32(0.5)
    sx = np.floor(p0pix[:, 0]).astype(np.int32)
    sy = np.floor(p0pix[:, 1]).astype(np.int32)

    for block in candidates:
        nblk = (M + block - 1) // block
        padM = nblk * block

        def padv(v, fill):
            return np.concatenate([v, np.full(padM - M, fill, v.dtype)])

        bx0 = padv(x0, x0[-1]).reshape(nblk, block)
        by0 = padv(y0, y0[-1]).reshape(nblk, block)
        rx = bx0.min(axis=1)
        ry = by0.min(axis=1)
        RW = int((bx0.max(axis=1) - rx).max()) + W + 2
        RH = int((by0.max(axis=1) - ry).max()) + H + 2
        if RW <= MAX_REGION and RH <= MAX_REGION:
            break
    return dict(muv=muv, q=q, x0=x0, y0=y0, x1=x1, y1=y1, W=W, H=H,
                sx=sx, sy=sy, rx=rx, ry=ry, RW=RW, RH=RH, M=M, nblk=nblk,
                padM=padM, block=block)


@partial(jax.jit, static_argnames=("B", "W", "H", "RW", "RH", "size",
                                   "rcp", "alpha_cutoff"))
def _classify_blocks(planeP, pad, muv, qn, x0, y0, x1, y1, sx, sy, rx, ry,
                     valid, fz, *, B, W, H, RW, RH, size, rcp,
                     alpha_cutoff):
    """All blocks of one work item on device.

    planeP: padded plane; pad: scalar padding offset.
    Per-block inputs shaped (nblk, BLOCK, ...); returns (nblk, BLOCK) int32
    above/below including the seed sample.
    """
    He = H + 2
    We = W + 2
    Ke = He * We
    RHW = RH * RW
    HW = H * W
    cutoff = jnp.float32(alpha_cutoff)
    one_i = jnp.int32(1)
    zero_i = jnp.int32(0)

    def block_fn(args):
        muv_b, qn_b, x0_b, y0_b, x1_b, y1_b, sx_b, sy_b, rx_b, ry_b, val_b = args

        # Region slice from the padded plane (absolute origin rx-1, ry-1
        # to cover the seed texel which can sit one texel left/up).
        org_y = ry_b - 1 + pad
        org_x = rx_b - 1 + pad
        regionE = jax.lax.dynamic_slice(planeP, (org_y, org_x),
                                        (RH + He, RW + We))

        # S: (Ke, RHW) statically shifted flattenings.
        S = jnp.stack([
            jax.lax.slice(regionE, (dy, dx), (dy + RH, dx + RW)).reshape(-1)
            for dy in range(He) for dx in range(We)], axis=0)

        # One-hot of window origins (shifted by the -1 region offset).
        oy = y0_b - (ry_b - 1)
        ox = x0_b - (rx_b - 1)
        origin = oy * RW + ox  # (B,)
        f = jax.lax.broadcasted_iota(jnp.int32, (RHW, B), 0)
        onehot = (f == origin[None, :]).astype(jnp.float32)

        # MXU gather: windows_ext[k, i] = region value at origin_i + (dy,dx).
        ext = jax.lax.dot_general(
            S, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (Ke, B)
        ext3 = ext.reshape(He, We, B)

        # 2x2 quad per window texel (gather order bake_kernels_cpu.h:259-273):
        # gx=(x,y) gy=(x,y+1) gz=(x+1,y+1) gw=(x+1,y)
        gx = ext3[:H, :W].reshape(HW, B)
        gy = ext3[1:H + 1, :W].reshape(HW, B)
        gz = ext3[1:H + 1, 1:W + 1].reshape(HW, B)
        gw = ext3[:H, 1:W + 1].reshape(HW, B)

        # Texel coords in (HW, B): absolute.
        dxg = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)[:, None]
        dyg = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)[:, None]
        px = x0_b[None, :] + dxg
        py = y0_b[None, :] + dyg

        # Conservative raster mask (cpu_raster.h:102-124) in (HW, B).
        sxf = px.astype(jnp.float32)
        syf = py.astype(jnp.float32)
        acc = None
        for e in range(3):
            pxe = qn_b[:, e, 0][None, :]
            pye = qn_b[:, e, 1][None, :]
            qxe = qn_b[:, (e + 1) % 3, 0][None, :]
            qye = qn_b[:, (e + 1) % 3, 1][None, :]
            nx = qye - pye
            ny = pxe - qxe
            from .levelline import guard as _g
            cc = -(_g(jnp, nx * pxe, fz) + _g(jnp, ny * pye, fz))
            ev = (_g(jnp, nx * sxf, fz) + _g(jnp, ny * syf, fz)) + cc
            bx = jnp.where(nx > 0, jnp.float32(0), nx)
            by = jnp.where(ny > 0, jnp.float32(0), ny)
            ok = (ev + bx + by) < jnp.float32(0)
            acc = ok if acc is None else (acc & ok)
        mask = acc & (px < x1_b[None, :]) & (py < y1_b[None, :])

        # Per-micro-tri params broadcast as (1, B) rows.
        tp = {}
        for i, nm in enumerate(("p0", "p1", "p2")):
            tp[nm + "x"] = muv_b[:, i, 0][None, :]
            tp[nm + "y"] = muv_b[:, i, 1][None, :]
        tp["p0p2x"] = tp["p0x"] - tp["p2x"]
        tp["p0p2y"] = tp["p0y"] - tp["p2y"]
        tp["p1p0x"] = tp["p1x"] - tp["p0x"]
        tp["p1p0y"] = tp["p1y"] - tp["p0y"]
        tp["p2p1x"] = tp["p2x"] - tp["p1x"]
        tp["p2p1y"] = tp["p2y"] - tp["p1y"]

        a_inc, b_inc = level_line_values_kernel(
            jnp, None, tp, px, py, gx, gy, gz, gw, size, rcp,
            alpha_cutoff, degenerate=False, fz=fz)
        above = jnp.where(mask, a_inc, zero_i).sum(axis=0, dtype=jnp.int32)
        below = jnp.where(mask, b_inc, zero_i).sum(axis=0, dtype=jnp.int32)

        # Seed bilinear at p0 (bake_cpu_impl.cpp:886-891): quad at the seed
        # texel, selected from ext by per-micro-tri window-relative offset
        # (sy - y0 in [0, H], sx - x0 in [0, W] since p0 lies in the AABB).
        sdy = sy_b - y0_b
        sdx = sx_b - x0_b
        kf = jax.lax.broadcasted_iota(jnp.int32, (Ke, B), 0)

        def pick(shift_y, shift_x):
            skk = (sdy + shift_y) * We + (sdx + shift_x)
            s = (kf == skk[None, :]).astype(jnp.float32)
            return (ext * s).sum(axis=0)

        a = pick(0, 0)   # I0x0
        b = pick(1, 0)   # I0x1
        c = pick(0, 1)   # I1x0
        d = pick(1, 1)   # I1x1
        from .levelline import guard as _g3
        p0pix_x = _g3(jnp, muv_b[:, 0, 0] * jnp.float32(float(size[0])),
                      fz) - jnp.float32(0.5)
        p0pix_y = _g3(jnp, muv_b[:, 0, 1] * jnp.float32(float(size[1])),
                      fz) - jnp.float32(0.5)
        wxf = p0pix_x - jnp.floor(p0pix_x)
        wyf = p0pix_y - jnp.floor(p0pix_y)
        onef = jnp.float32(1.0)
        from .levelline import guard as _g2
        ac = _g2(jnp, a * (onef - wxf), fz) + _g2(jnp, c * wxf, fz)
        bd = _g2(jnp, b * (onef - wxf), fz) + _g2(jnp, d * wxf, fz)
        seed = _g2(jnp, ac * (onef - wyf), fz) + _g2(jnp, bd * wyf, fz)
        seed_above = cutoff < seed
        above = above + jnp.where(seed_above, one_i, zero_i)
        below = below + jnp.where(~seed_above, one_i, zero_i)
        return (jnp.where(val_b, above, zero_i),
                jnp.where(val_b, below, zero_i))

    return jax.lax.map(block_fn, (muv, qn, x0, y0, x1, y1, sx, sy, rx, ry,
                                  valid))


def classify_work_item_mxu(texture: Texture, cfg, uv_tri: np.ndarray,
                           subdiv: int, states: np.ndarray):
    """Drop-in fine-pass (linear filter, non-degenerate, level-line).

    Returns updated states, or None when the fast path's preconditions
    don't hold (caller falls back to the gather path)."""
    active = states == UO
    if not active.any():
        return states

    if not bool(geom.winding_stable(uv_tri, subdiv)):
        # fp32-thin sliver: this engine normalizes corners with the
        # macro winding, which the oracle's per-micro-triangle test can
        # contradict — fall back (geom.winding_stable derivation)
        return None

    border = cfg.addr_mode == TextureAddressMode.Border
    per_mip = []
    muv0 = bird.micro_triangle_uvs(
        uv_tri, np.arange(get_num_micro_triangles(subdiv), dtype=np.uint32),
        subdiv)  # mip-independent; hoisted out of the mip loop
    for mip in range(texture.mip_count):
        pc = _host_precompute(texture, uv_tri, subdiv, mip, muv=muv0)
        w, h = texture.size(mip)
        if border:
            # Border runtime-bilinear seed quirk: the oracle clamps the
            # kTexCoordBorder sentinel instead of applying borderAlpha
            # (texture.Texture.bilinear).  The padded plane reproduces
            # borderAlpha, so require every seed 2x2 footprint in-bounds.
            if ((pc["sx"] < 0).any() or (pc["sy"] < 0).any()
                    or (pc["sx"] > w - 2).any() or (pc["sy"] > h - 2).any()):
                return None
        if pc["RW"] > MAX_REGION or pc["RH"] > MAX_REGION:
            return None
        # Pad covers the worst-case region overshoot so every region slice
        # is in-bounds (padded texels carry the wrap-mode-resolved values).
        # Pow2-bucketed: a LARGER pad keeps every containment bound valid
        # (same wrap-resolved ring values, shifted consistently via the
        # `pad` operand) while collapsing the per-item plane re-uploads
        # and jit signatures onto a few shared shapes.
        pad_req = max(pc["RW"] + pc["W"] + 3, pc["RH"] + pc["H"] + 3)
        pad = 1 << (int(pad_req) - 1).bit_length()
        if (pc["rx"].min() - 1 < -pad or pc["ry"].min() - 1 < -pad
                or (pc["rx"].max() - 1 + pc["RW"] + pc["W"] + 2) > w + pad
                or (pc["ry"].max() - 1 + pc["RH"] + pc["H"] + 2) > h + pad):
            return None
        # Seed texel must sit within its window's extended footprint.
        if ((pc["sx"] < pc["x0"]).any() or (pc["sy"] < pc["y0"]).any()
                or (pc["sx"] > pc["x0"] + pc["W"]).any()
                or (pc["sy"] > pc["y0"] + pc["H"]).any()):
            return None
        per_mip.append((pc, pad))

    ccw = bool(geom.is_ccw(uv_tri))

    M = get_num_micro_triangles(subdiv)
    above = np.zeros(M, dtype=np.int64)
    below = np.zeros(M, dtype=np.int64)
    alive = np.ones(M, dtype=bool)

    for mip, (pc, pad) in enumerate(per_mip):
        w, h = texture.size(mip)
        info = texture.info[mip]
        planeP = _padded_plane_cached(texture, mip, pad, cfg.addr_mode,
                                      float(cfg.border_alpha))
        nblk = pc["nblk"]
        padM = pc["padM"]
        B = pc["block"]

        def blockify(v, fill=0):
            vp = np.concatenate(
                [v, np.full((padM - pc["M"],) + v.shape[1:], fill, v.dtype)])
            return jnp.asarray(vp.reshape((nblk, B) + v.shape[1:]))

        q = pc["q"]
        qn = np.where(ccw, q, q[:, ::-1, :]).astype(np.float32)
        valid = np.zeros(padM, dtype=bool)
        valid[:pc["M"]] = True

        a_b, b_b = _classify_blocks(
            planeP, pad,
            blockify(pc["muv"]), blockify(qn),
            blockify(pc["x0"]), blockify(pc["y0"]),
            blockify(pc["x1"]), blockify(pc["y1"]),
            blockify(pc["sx"]), blockify(pc["sy"]),
            jnp.asarray(pc["rx"]), jnp.asarray(pc["ry"]),
            jnp.asarray(valid.reshape(nblk, B)), jnp.int32(0),
            B=B, W=pc["W"], H=pc["H"], RW=pc["RW"], RH=pc["RH"],
            size=(w, h),
            rcp=(float(info.rcp_size[0]), float(info.rcp_size[1])),
            alpha_cutoff=float(cfg.alpha_cutoff))
        a_np = np.asarray(a_b).reshape(-1)[:M]
        b_np = np.asarray(b_b).reshape(-1)[:M]
        above += np.where(alive, a_np, 0)
        below += np.where(alive, b_np, 0)
        st = get_state_from_coverage(np, cfg.fmt, cfg.promotion,
                                     cfg.cutoff_gt, cfg.cutoff_le, above, below)
        alive &= ~((st == UO) | (st == int(OpacityState.UnknownTransparent)))

    final = get_state_from_coverage(np, cfg.fmt, cfg.promotion, cfg.cutoff_gt,
                                    cfg.cutoff_le, above, below)
    out = states.copy()
    out[active] = final[active].astype(np.uint8)
    return out
