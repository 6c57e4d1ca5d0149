"""Pallas TPU kernel for micro-triangle classification.

Same one-hot-matmul gather formulation as kernels/mxu_classify.py, but the
one-hot matrix and all intermediates live in VMEM: XLA precomputes the
per-block stack of shifted region flattenings S (dense shifts, fused), and
the kernel — one grid step per block of B consecutive bird-curve
micro-triangles — builds the window-origin one-hot with an iota compare,
gathers the texel windows with an MXU matmul, and runs the level-line math
in (HW, B) layout with micro-triangles along lanes.  fp32 op order matches
the numpy oracle (shared level_line_values_kernel); the matmul is exact
because the one-hot operand is exactly 0/1 and precision=HIGHEST.

Used by backend='pallas' (bake.py) and by bench.py on TPU; falls back to
the jax path when the fast-path preconditions fail (see
classify_work_item_mxu's prechecks, reused here).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geom
from ..texture import Texture
from ..types import (OpacityState, TextureAddressMode, TextureFilterMode,
                     get_num_micro_triangles)
from .levelline import get_state_from_coverage, level_line_values_kernel
from . import mxu_classify as mx

UO = int(OpacityState.UnknownOpaque)
B = 128  # micro-triangles per grid step (lane count)


def _build_S(planeP, pad, rx, ry, He, We, RH, RW):
    """(nblk, Ke, RHW) stack of shifted region flattenings, built densely in
    XLA (fused shifts; the only HBM-resident intermediate)."""
    def one(rx_b, ry_b):
        regionE = jax.lax.dynamic_slice(planeP, (ry_b - 1 + pad, rx_b - 1 + pad),
                                        (RH + He, RW + We))
        return jnp.stack([
            jax.lax.slice(regionE, (dy, dx), (dy + RH, dx + RW)).reshape(-1)
            for dy in range(He) for dx in range(We)], axis=0)
    return jax.lax.map(lambda ab: one(ab[0], ab[1]), (rx, ry))


def _kernel(origin_ref, seedoff_ref, S_ref, muv_ref, qn_ref, geo_ref,
            above_ref, below_ref, *, Ke, RHW, H, W, He, We,
            size, rcp, alpha_cutoff):
    """One block: gather windows via MXU, classify, reduce.

    origin_ref: (1, B) i32 window-origin flat index into the region.
    seedoff_ref: (1, B) i32 seed texel offset within the extended window.
    S_ref: (Ke, RHW) f32.  muv_ref/qn_ref: (6, B) f32 corner coords.
    geo_ref: (6, B) i32 rows [x0, y0, x1, y1, sx_rel unused, valid].
    """
    HW = H * W
    cutoff = jnp.float32(alpha_cutoff)
    one_i = jnp.int32(1)
    zero_i = jnp.int32(0)

    origin = origin_ref[0, 0:1, :]  # (1, B) — keep all values 2D in Mosaic
    f = jax.lax.broadcasted_iota(jnp.int32, (RHW, B), 0)
    onehot = (f == origin).astype(jnp.float32)

    ext = jax.lax.dot_general(
        S_ref[0], onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (Ke, B)

    # Row k of ext = texel (y0 + k // We, x0 + k % We); leading-dim
    # reshapes/slices are free (lanes stay B).
    ext3 = ext.reshape(He, We, B)
    gx = ext3[0:H, 0:W].reshape(HW, B)
    gy = ext3[1:H + 1, 0:W].reshape(HW, B)
    gz = ext3[1:H + 1, 1:W + 1].reshape(HW, B)
    gw = ext3[0:H, 1:W + 1].reshape(HW, B)

    x0 = geo_ref[0, 0:1, :]
    y0 = geo_ref[0, 1:2, :]
    x1 = geo_ref[0, 2:3, :]
    y1 = geo_ref[0, 3:4, :]
    val = geo_ref[0, 5:6, :] != 0

    dxg = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W
    dyg = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) // W
    px = x0 + dxg
    py = y0 + dyg

    # Conservative raster mask (cpu_raster.h:102-124).
    sxf = px.astype(jnp.float32)
    syf = py.astype(jnp.float32)
    qnx = [qn_ref[0, 2 * e:2 * e + 1, :] for e in range(3)]
    qny = [qn_ref[0, 2 * e + 1:2 * e + 2, :] for e in range(3)]
    acc = None
    for e in range(3):
        nx = qny[(e + 1) % 3] - qny[e]
        ny = qnx[e] - qnx[(e + 1) % 3]
        cc = -(nx * qnx[e] + ny * qny[e])
        ev = (nx * sxf + ny * syf) + cc
        bx = jnp.where(nx > 0, jnp.float32(0), nx)
        by = jnp.where(ny > 0, jnp.float32(0), ny)
        ok = (ev + bx + by) < jnp.float32(0)
        acc = ok if acc is None else (acc & ok)
    mask = acc & (px < x1) & (py < y1)

    tp = {}
    for i, nm in enumerate(("p0", "p1", "p2")):
        tp[nm + "x"] = muv_ref[0, 2 * i:2 * i + 1, :]
        tp[nm + "y"] = muv_ref[0, 2 * i + 1:2 * i + 2, :]
    tp["p0p2x"] = tp["p0x"] - tp["p2x"]
    tp["p0p2y"] = tp["p0y"] - tp["p2y"]
    tp["p1p0x"] = tp["p1x"] - tp["p0x"]
    tp["p1p0y"] = tp["p1y"] - tp["p0y"]
    tp["p2p1x"] = tp["p2x"] - tp["p1x"]
    tp["p2p1y"] = tp["p2y"] - tp["p1y"]

    a_inc, b_inc = level_line_values_kernel(
        jnp, None, tp, px, py, gx, gy, gz, gw, size, rcp, alpha_cutoff,
        degenerate=False)
    above = jnp.where(mask, a_inc, zero_i).sum(axis=0, keepdims=True,
                                               dtype=jnp.int32)
    below = jnp.where(mask, b_inc, zero_i).sum(axis=0, keepdims=True,
                                               dtype=jnp.int32)

    # Seed bilinear at p0: quad selected from ext by per-micro-tri offset.
    soff = seedoff_ref[0, 0:1, :]  # (1, B) = (sy - y0) * We + (sx - x0)
    kf = jax.lax.broadcasted_iota(jnp.int32, (Ke, B), 0)

    def pick(shift):
        sel = (kf == (soff + shift)).astype(jnp.float32)
        return (ext * sel).sum(axis=0, keepdims=True)

    a = pick(0)       # I0x0
    b = pick(We)      # I0x1 (y+1)
    c = pick(1)       # I1x0 (x+1)
    d = pick(We + 1)  # I1x1
    p0px = muv_ref[0, 0:1, :] * jnp.float32(float(size[0])) - jnp.float32(0.5)
    p0py = muv_ref[0, 1:2, :] * jnp.float32(float(size[1])) - jnp.float32(0.5)
    wxf = p0px - jnp.floor(p0px)
    wyf = p0py - jnp.floor(p0py)
    onef = jnp.float32(1.0)
    ac = a * (onef - wxf) + c * wxf
    bd = b * (onef - wxf) + d * wxf
    seed = ac * (onef - wyf) + bd * wyf
    seed_above = cutoff < seed
    above = above + jnp.where(seed_above, one_i, zero_i)
    below = below + jnp.where(~seed_above, one_i, zero_i)

    above_ref[0] = jnp.where(val, above, zero_i)
    below_ref[0] = jnp.where(val, below, zero_i)


@partial(jax.jit, static_argnames=("Ke", "RHW", "H", "W", "He", "We",
                                   "size", "rcp", "alpha_cutoff", "nblk"))
def _run(S, origin, seedoff, muv_r, qn_r, geo, *, Ke, RHW, H, W, He, We,
         size, rcp, alpha_cutoff, nblk):
    kern = partial(_kernel, Ke=Ke, RHW=RHW, H=H, W=W, He=He, We=We,
                   size=size, rcp=rcp, alpha_cutoff=alpha_cutoff)
    grid = (nblk,)
    out_shape = (jax.ShapeDtypeStruct((nblk, 1, B), jnp.int32),
                 jax.ShapeDtypeStruct((nblk, 1, B), jnp.int32))
    a, b = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ke, RHW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shape,
    )(origin.reshape(nblk, 1, B), seedoff.reshape(nblk, 1, B), S, muv_r,
      qn_r, geo)
    return a.reshape(nblk, B), b.reshape(nblk, B)


def classify_work_item_pallas(texture: Texture, cfg, uv_tri: np.ndarray,
                              subdiv: int, states: np.ndarray):
    """Drop-in fine-pass using the Pallas kernel; returns updated states or
    falls back to the device gather path when preconditions fail."""
    from .jax_classify import classify_work_item_jax

    if (cfg.addr_mode == TextureAddressMode.Border
            or cfg.filter != TextureFilterMode.Linear
            or cfg.disable_level_line
            or bool(geom.is_degenerate(uv_tri))):
        return classify_work_item_jax(texture, cfg, uv_tri, subdiv, states)

    active = states == UO
    if not active.any():
        return states

    per_mip = []
    for mip in range(texture.mip_count):
        pc = mx._host_precompute(texture, uv_tri, subdiv, mip,
                                 candidates=(B,))
        w, h = texture.size(mip)
        if pc is None or pc["RW"] > mx.MAX_REGION or pc["RH"] > mx.MAX_REGION:
            return classify_work_item_jax(texture, cfg, uv_tri, subdiv, states)
        pad = max(pc["RW"] + pc["W"] + 3, pc["RH"] + pc["H"] + 3)
        if (pc["rx"].min() - 1 < -pad or pc["ry"].min() - 1 < -pad
                or (pc["rx"].max() - 1 + pc["RW"] + pc["W"] + 2) > w + pad
                or (pc["ry"].max() - 1 + pc["RH"] + pc["H"] + 2) > h + pad):
            return classify_work_item_jax(texture, cfg, uv_tri, subdiv, states)
        if ((pc["sx"] < pc["x0"]).any() or (pc["sy"] < pc["y0"]).any()
                or (pc["sx"] > pc["x0"] + pc["W"]).any()
                or (pc["sy"] > pc["y0"] + pc["H"]).any()):
            return classify_work_item_jax(texture, cfg, uv_tri, subdiv, states)
        per_mip.append((pc, pad))

    ccw = bool(geom.is_ccw(uv_tri))
    M = get_num_micro_triangles(subdiv)
    above = np.zeros(M, dtype=np.int64)
    below = np.zeros(M, dtype=np.int64)
    alive = np.ones(M, dtype=bool)

    for mip, (pc, pad) in enumerate(per_mip):
        w, h = texture.size(mip)
        info = texture.info[mip]
        planeP = jnp.asarray(mx.padded_plane(texture, mip, pad, cfg.addr_mode))
        nblk = pc["nblk"]
        padM = pc["padM"]
        H, W = pc["H"], pc["W"]
        He, We = H + 2, W + 2
        Ke = He * We
        RH, RW = pc["RH"], pc["RW"]
        RHW = RH * RW

        S = _build_S(planeP, pad, jnp.asarray(pc["rx"]), jnp.asarray(pc["ry"]),
                     He, We, RH, RW)

        def padv(v, fill=0):
            return np.concatenate(
                [v, np.full((padM - M,) + v.shape[1:], fill, v.dtype)])

        x0 = padv(pc["x0"])
        y0 = padv(pc["y0"])
        x1 = padv(pc["x1"])
        y1 = padv(pc["y1"])
        sx = padv(pc["sx"])
        sy = padv(pc["sy"])
        rxb = np.repeat(pc["rx"], B)
        ryb = np.repeat(pc["ry"], B)
        origin = ((y0 - (ryb - 1)) * RW + (x0 - (rxb - 1))).astype(np.int32)
        seedoff = ((sy - y0) * We + (sx - x0)).astype(np.int32)
        valid = np.zeros(padM, np.int32)
        valid[:M] = 1

        q = pc["q"]
        qn = np.where(ccw, q, q[:, ::-1, :]).astype(np.float32)
        muv = pc["muv"]

        def rows6(a3):  # (padM, 3, 2) -> (nblk, 6, B) row-major pairs
            v = padv(a3).reshape(padM, 6)
            return jnp.asarray(np.transpose(v.reshape(nblk, B, 6), (0, 2, 1))
                               .astype(np.float32))

        geo = np.stack([x0, y0, x1, y1, np.zeros_like(x0), valid], axis=1)
        geo = jnp.asarray(np.transpose(geo.reshape(nblk, B, 6), (0, 2, 1))
                          .astype(np.int32))

        try:
            a_b, b_b = _run(
                S, jnp.asarray(origin.reshape(nblk, B)),
                jnp.asarray(seedoff.reshape(nblk, B)),
                rows6(muv), rows6(qn), geo,
                Ke=Ke, RHW=RHW, H=H, W=W, He=He, We=We, size=(w, h),
                rcp=(float(info.rcp_size[0]), float(info.rcp_size[1])),
                alpha_cutoff=float(cfg.alpha_cutoff), nblk=nblk)
        except Exception:  # Mosaic lowering gap on this toolchain
            return classify_work_item_jax(texture, cfg, uv_tri, subdiv,
                                          states)
        a_np = np.asarray(a_b).reshape(-1)[:M]
        b_np = np.asarray(b_b).reshape(-1)[:M]
        above += np.where(alive, a_np, 0)
        below += np.where(alive, b_np, 0)
        st = get_state_from_coverage(np, cfg.fmt, cfg.promotion,
                                     cfg.cutoff_gt, cfg.cutoff_le,
                                     above, below)
        alive &= ~((st == UO) | (st == int(OpacityState.UnknownTransparent)))

    final = get_state_from_coverage(np, cfg.fmt, cfg.promotion, cfg.cutoff_gt,
                                    cfg.cutoff_le, above, below)
    out = states.copy()
    out[active] = final[active].astype(np.uint8)
    return out
