"""Pallas TPU kernel for exact micro-triangle classification.

The tile-streamed (v3) engine: micro-triangles arrive pre-sorted by
32-texel texture tile (the two-phase driver builds the schedule on
device — kernels/twophase.py); each grid step streams one halo tile
(tile + window apron) through VMEM via a scalar-prefetch-driven
BlockSpec index map (automatic double buffering) and classifies a block
of B=128 micro-triangles:

  column select   C1_dx = tile @ colhot_dx     (MXU matmul per dx shift)
  row select      ext[(dy,dx)] = sum_y C1_dx[y] * [y == oy_i + dy]
                                                  (sublane mask-reduce)

The level-line math then runs in (HW, B) layout — micro-triangles along
lanes — through the shared level_line_values_kernel, so the fp32 op
order matches the numpy oracle exactly.  The matmuls are exact: the
one-hot operand is exactly 0/1 and precision=HIGHEST.  An optional
runtime fence token (fz) guards against fp contraction when the kernel
body executes through XLA:CPU (interpret mode); Mosaic's TPU codegen is
verified non-contracting, so real chips skip it (KERNEL_FENCE).

This is the "conservative raster as matmul" engine anticipated in
SURVEY.md §7 step 4; the two-phase batch driver (backend='pallas' in
bake.py) and bench.py run survivors through it, with fallback to the
XLA-gather path when the fast-path preconditions fail.
"""
from __future__ import annotations

import os
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
from .fallback import KERNEL_FALLBACK_ERRORS, record as fallback_record
from .levelline import get_state_from_coverage, level_line_values_kernel
from . import mxu_classify as mx

UO = int(OpacityState.UnknownOpaque)


_KERNEL_FENCE: bool | None = None


def kernel_fence() -> bool:
    """In-kernel fp-contraction fence policy: Mosaic's TPU codegen does
    not contract fp32 mul+add (verified by the smooth-alpha foliage
    parity checks, tests/test_scene_e2e.py + bench.py's gate), so the
    fence is only needed when the kernel body runs through XLA:CPU
    (interpret mode in tests).  Override with OMM_TPU_KERNEL_FENCE=0/1.

    Resolved lazily on first kernel use — `jax.default_backend()`
    initializes the device client, and importing the package must work
    (for the numpy backend) even when no jax backend is reachable."""
    global _KERNEL_FENCE
    if _KERNEL_FENCE is None:
        v = os.environ.get("OMM_TPU_KERNEL_FENCE")
        if v is not None:
            _KERNEL_FENCE = v not in ("0", "false", "False")
        else:
            import jax
            _KERNEL_FENCE = jax.default_backend() == "cpu"
    return _KERNEL_FENCE
B = int(os.environ.get("OMM_PALLAS_BLOCK", "128"))  # micro-tris per grid step


def classify_work_item_pallas(texture: Texture, cfg, uv_tri: np.ndarray,
                              subdiv: int, states: np.ndarray):
    """Drop-in fine-pass using the tile-pipelined Pallas kernel; falls back
    to the device gather path when preconditions fail."""
    from .jax_classify import classify_work_item_jax

    active = states == UO
    if not active.any():
        return states

    jobs = prepare_jobs_v3(texture, cfg, uv_tri, subdiv)
    if jobs is None:
        return classify_work_item_jax(texture, cfg, uv_tri, subdiv, states)

    M = get_num_micro_triangles(subdiv)
    above = np.zeros(M, dtype=np.int64)
    below = np.zeros(M, dtype=np.int64)
    alive = np.ones(M, dtype=bool)

    for job in jobs:
        try:
            a_b, b_b = run_job_v3(job)
            a_np, b_np = gather_v3(job, a_b, b_b)
        except KERNEL_FALLBACK_ERRORS as e:
            # toolchain gap (Mosaic lowering / backend compile): recorded
            # + warned, then the XLA-gather path takes the item
            fallback_record("pallas_classify.run_job_v3", e)
            return classify_work_item_jax(texture, cfg, uv_tri, subdiv,
                                          states)
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


# ---------------------------------------------------------------------------
# v3: tile-pipelined variant — micro-triangles re-sorted by texture tile,
# tile (with apron) streamed through the normal BlockSpec pipeline with a
# scalar-prefetch-driven index map (no manual DMA; automatic double
# buffering).  Same math as the v2 kernel.
# ---------------------------------------------------------------------------

# Texel tile edge for the exact kernel's halo-tile streaming.  64 beats
# 32 on v5e for the driver workload: contour survivors cluster, so
# bigger tiles fill their B-lane slot blocks (less tile-boundary padding
# waste in stage C) while the halo region still fits VMEM comfortably;
# 128 regresses (region DMA per block outgrows the padding savings).
TILE = int(os.environ.get("OMM_PALLAS_TILE", "64"))


def bf16x3_safe(plane) -> bool:
    """True when every plane value admits the exact 3-term bf16 split
    used by `_kernel_body`'s column select: finite and either zero or
    2^-110 <= |x| < 2^127.  Below 2^-110 the third term's bits fall
    under bf16's denormal floor (2^-133) and the reconstruction rounds
    (verified by direct fuzz over random fp32 bit patterns); at the top,
    RN to bf16 can overflow to inf.  Real alpha planes (UNORM8, [0,1]
    fp32 content) are always safe; the scan runs once per cached padded
    plane and unsafe planes keep the fp32-HIGHEST matmul."""
    a = np.abs(np.asarray(plane))
    lo = np.float32(2.0 ** -110)
    hi = np.float32(2.0 ** 127)
    with np.errstate(invalid="ignore"):
        ok = np.isfinite(a) & ((a == 0) | ((a >= lo) & (a < hi)))
    return bool(ok.all())


def bf16x3_policy(exact: str) -> bool:
    """Whether an engine WANTS the bf16x3 split (bf16x3_safe still gates
    per plane).  Measured NEGATIVE on v5e both ways (round-5 session-3
    same-window A/Bs): Mosaic kernel 800.8M (HIGHEST) vs 764.6M (split)
    on the 256-tri subdiv-9 headline, and pure-XLA ComputeOnly spot
    312.2M (HIGHEST) vs 264.6M (split), all bit-exact — the TPU's
    native fp32 matmul path beats 3 explicit bf16 passes plus the
    fp32->bf16 conversions and two adds, on both code paths.  Default
    OFF everywhere; the exact-split machinery stays (proven by fuzz +
    parity tests) for re-evaluation on hardware where fp32 HIGHEST
    really is 2x the 3-pass cost.  OMM_TP_BF16X3=1 re-enables for
    sweeps."""
    v = os.environ.get("OMM_TP_BF16X3")
    if v is not None:
        return v not in ("0", "false", "False")
    return False


def bary_cols(index, level: int):
    """index2bary (bird.h:73-118) in column form: returns (u, v, d) fp32
    so the corners are (u,v), (u+d,v), (u,v+d) — same fp ops as
    bird.index2bary.  Lowerable under Mosaic (uint32 bit ops on 2-D
    vectors)."""
    from .. import bird
    iu, iv, iw = bird.index2dbary(index, jnp)
    mask = jnp.uint32((1 << level) - 1)
    iu = iu & mask
    iv = iv & mask
    iw = iw & mask
    upright = ((iu & 1) ^ (iv & 1) ^ (iw & 1)).astype(bool)
    one = jnp.uint32(1)
    iu = jnp.where(upright, iu, iu + one)
    iv = jnp.where(upright, iv, iv + one)
    ls = jnp.float32(np.float32(2.0) ** np.float32(-level))
    d = jnp.where(upright, ls, -ls).astype(jnp.float32)
    # cast via int32: Mosaic has no uint32->f32 rule; values < 2^level
    # so the detour is value-exact on every backend
    fu = iu.astype(jnp.int32).astype(jnp.float32)
    fv = iv.astype(jnp.int32).astype(jnp.float32)
    return fu * ls, fv * ls, d


def corner_cols(tri6, bu, bv, bd, fz=None):
    """InterpolateTriangleUV in column form (geometry.h:241-248):
    p = p0*(1-u-v) + p1*u + p2*v for the three subtriangle corners.
    tri6: 6 scalar-or-(...,) columns (p0x,p0y,p1x,p1y,p2x,p2y).  Products
    are contraction-guarded so corner UVs are bit-identical to the host
    bird path (kernels.levelline.guard)."""
    from .levelline import guard
    p0x, p0y, p1x, p1y, p2x, p2y = tri6
    onef = jnp.float32(1.0)

    def corner(u_, v_):
        w_ = onef - u_ - v_
        return (guard(jnp, p0x * w_, fz) + guard(jnp, p1x * u_, fz)
                + guard(jnp, p2x * v_, fz),
                guard(jnp, p0y * w_, fz) + guard(jnp, p1y * u_, fz)
                + guard(jnp, p2y * v_, fz))

    ax, ay = corner(bu, bv)
    bx, by = corner(bu + bd, bv)
    cx, cy = corner(bu, bv + bd)
    return (ax, ay), (bx, by), (cx, cy)


def derive_slot_geometry(ids, uv6T, ccw1T, bt, fz, *, subdiv, pad, ntx,
                         size, period=None):
    """Per-slot geometry from survivor ids + the tiny per-item UV table —
    replaces 22 scattered rows with one (ids) plus an exact one-hot MXU
    table lookup.  Reproduces _stageC_mip's exact fp32 op order.

    ids: (1, B) int32 flat survivor id t*M + m, -1 = invalid slot.
    uv6T: (6, T) fp32; ccw1T: (1, T) fp32 0/1; bt: scalar int32 tile id.
    Returns (muv_rows, qn_rows, x0, y0, x1, y1, ox, oy, sdy, sdx, val).
    """
    M = 1 << (2 * subdiv)
    val = ids >= 0
    idc = jnp.where(val, ids, 0)
    sv_t = idc >> (2 * subdiv)
    sv_m = (idc & (M - 1)).astype(jnp.uint32)

    T = uv6T.shape[1]
    tio = jax.lax.broadcasted_iota(jnp.int32, (T, ids.shape[1]), 0)
    th = (tio == sv_t).astype(jnp.float32)  # exact one-hot (T, B)
    tri6m = jax.lax.dot_general(
        uv6T, th, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (6, B)
    tri6 = tuple(tri6m[r:r + 1, :] for r in range(6))
    ccw = jax.lax.dot_general(
        ccw1T, th, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32) > jnp.float32(0.5)

    bu, bv, bd = bary_cols(sv_m, subdiv)
    (ax, ay), (bx2, by2), (cx, cy) = corner_cols(tri6, bu, bv, bd, fz)
    w, h = size
    wf = jnp.float32(float(w))
    hf = jnp.float32(float(h))
    half = jnp.float32(0.5)
    from .levelline import guard as _g
    qs = [(_g(jnp, ax * wf, fz) - half, _g(jnp, ay * hf, fz) - half),
          (_g(jnp, bx2 * wf, fz) - half, _g(jnp, by2 * hf, fz) - half),
          (_g(jnp, cx * wf, fz) - half, _g(jnp, cy * hf, fz) - half)]
    x0 = jnp.floor(jnp.minimum(jnp.minimum(qs[0][0], qs[1][0]),
                               qs[2][0])).astype(jnp.int32)
    y0 = jnp.floor(jnp.minimum(jnp.minimum(qs[0][1], qs[1][1]),
                               qs[2][1])).astype(jnp.int32)
    x1 = jnp.ceil(jnp.maximum(jnp.maximum(qs[0][0], qs[1][0]),
                              qs[2][0])).astype(jnp.int32)
    y1 = jnp.ceil(jnp.maximum(jnp.maximum(qs[0][1], qs[1][1]),
                              qs[2][1])).astype(jnp.int32)
    sx = jnp.floor(qs[0][0]).astype(jnp.int32)
    sy = jnp.floor(qs[0][1]).astype(jnp.int32)

    flip = ~ccw
    qn_rows = []
    for k in range(3):
        src = [qs[k], qs[2 - k]]
        qn_rows.append(jnp.where(flip, src[1][0], src[0][0]))
        qn_rows.append(jnp.where(flip, src[1][1], src[0][1]))

    muv_rows = [ax, ay, bx2, by2, cx, cy]

    btx = bt % ntx
    bty = bt // ntx
    # Memory offsets only: periodic modes wrap the window origin into the
    # canonical period (matching the slot sort's tile assignment) while
    # the GEOMETRY above keeps the true absolute coordinates — the fp32
    # level-line math must see the oracle's own raster coords.
    if period is not None:
        x0m = x0 % jnp.int32(period[0])
        y0m = y0 % jnp.int32(period[1])
    else:
        x0m, y0m = x0, y0
    ox = (x0m + pad - btx * TILE).astype(jnp.int32)
    oy = (y0m + pad - bty * TILE).astype(jnp.int32)
    return (muv_rows, qn_rows, x0, y0, x1, y1, ox, oy,
            sy - y0, sx - x0, val)


def _kernel_v3(tidx_ref, tile_ref, ids_ref, uv6T_ref, ccw_ref, fz_ref,
               above_ref, below_ref, *, H, W, He, We, TSA,
               size, rcp, alpha_cutoff, subdiv, pad, ntx, period=None,
               bf16x3=False):
    fz = fz_ref[0, 0]
    bt = tidx_ref[pl.program_id(0)]
    geom_rows = derive_slot_geometry(
        ids_ref[0], uv6T_ref[...], ccw_ref[...], bt, fz, subdiv=subdiv,
        pad=pad, ntx=ntx, size=size, period=period)
    a, b = _kernel_body(tile_ref[0], geom_rows,
                        H=H, W=W, He=He, We=We, RHe=TSA, RWe=TSA,
                        size=size, rcp=rcp, alpha_cutoff=alpha_cutoff,
                        fz=fz, bf16x3=bf16x3)
    above_ref[0] = a
    below_ref[0] = b


def _kernel_body(region, geom_rows, *,
                 H, W, He, We, RHe, RWe, size, rcp, alpha_cutoff,
                 fz=None, bf16x3=False):
    HW = H * W
    Ke = He * We
    cutoff = jnp.float32(alpha_cutoff)
    one_i = jnp.int32(1)
    zero_i = jnp.int32(0)

    (muv_rows, qn_rows, x0, y0, x1, y1, ox, oy, sdy, sdx,
     val) = geom_rows

    # Column select at We*B lanes: lane group dx holds
    # C6[y, dx*B + i] = region[y, ox_i + dx].  The one-hot operand is
    # exact 0/1, so the contraction adds zeros and one exact value —
    # bit-exact gather semantics on the MXU.  When the plane admits it
    # (bf16x3, see bf16x3_safe), instead of one fp32 HIGHEST dot
    # (6 bf16 MXU passes) split the region operand into THREE bf16
    # terms that reconstruct every admissible fp32 exactly (hi = RN(x)
    # leaves |x-hi| <= ulp_bf16(x)/2, so each residual is exact fp32 by
    # Sterbenz and the three 8-bit mantissa windows cover fp32's 24
    # bits) and run one DEFAULT bf16 pass per term: each product is
    # bf16 * {0,1} -> exact, and (hi + lo) + lo2 re-sums to x exactly
    # (each partial spans < 24 mantissa bits).  Halves the kernel's MXU
    # work; bit-exactness covered by the engine parity suites on every
    # backend plus the direct split fuzz in test_twophase.
    xio6 = jax.lax.broadcasted_iota(jnp.int32, (RWe, We * B), 0)
    ox6 = jnp.concatenate([ox + dx for dx in range(We)], axis=1)
    if bf16x3:
        colhot = (xio6 == ox6).astype(jnp.bfloat16)
        r_hi = region.astype(jnp.bfloat16)
        r1 = region - r_hi.astype(jnp.float32)
        r_lo = r1.astype(jnp.bfloat16)
        r_lo2 = (r1 - r_lo.astype(jnp.float32)).astype(jnp.bfloat16)

        def _sel(rb):
            return jax.lax.dot_general(
                rb, colhot, dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        C6 = (_sel(r_hi) + _sel(r_lo)) + _sel(r_lo2)  # (RHe, We*B)
    else:
        colhot = (xio6 == ox6).astype(jnp.float32)
        C6 = jax.lax.dot_general(
            region, colhot, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (RHe, We*B)

    # Row select, one wide pass per dy: m[dy][dx*B + i] = C6[oy_i+dy, ..].
    yio6 = jax.lax.broadcasted_iota(jnp.int32, (RHe, We * B), 0)
    oy6 = jnp.concatenate([oy] * We, axis=1)
    rows6 = []
    for dy in range(He):
        m = jnp.where(yio6 == (oy6 + dy), C6, jnp.float32(0.0))
        rows6.append(m.sum(axis=0, keepdims=True))  # (1, We*B)

    # Reassemble (Ke, B), k = dy*We + dx (pure lane-block copies).
    ext = jnp.concatenate(
        [jax.lax.slice(rows6[dy], (0, dx * B), (1, (dx + 1) * B))
         for dy in range(He) for dx in range(We)], axis=0)  # (Ke, B)

    ext3 = ext.reshape(He, We, B)
    gx = ext3[0:H, 0:W].reshape(HW, B)
    gy = ext3[1:H + 1, 0:W].reshape(HW, B)
    gz = ext3[1:H + 1, 1:W + 1].reshape(HW, B)
    gw = ext3[0:H, 1:W + 1].reshape(HW, B)

    dxg = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W
    dyg = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) // W
    px = x0 + dxg
    py = y0 + dyg

    sxf = px.astype(jnp.float32)
    syf = py.astype(jnp.float32)
    from .levelline import guard as _g
    qnx = [qn_rows[2 * e] for e in range(3)]
    qny = [qn_rows[2 * e + 1] for e in range(3)]
    acc = None
    for e in range(3):
        nx = qny[(e + 1) % 3] - qny[e]
        ny = qnx[e] - qnx[(e + 1) % 3]
        cc = -(_g(jnp, nx * qnx[e], fz) + _g(jnp, ny * qny[e], fz))
        ev = (_g(jnp, nx * sxf, fz) + _g(jnp, ny * syf, fz)) + cc
        bx = jnp.where(nx > 0, jnp.float32(0), nx)
        by = jnp.where(ny > 0, jnp.float32(0), ny)
        ok = (ev + bx + by) < jnp.float32(0)
        acc = ok if acc is None else (acc & ok)
    mask = acc & (px < x1) & (py < y1)

    tp = {}
    for k, nm in enumerate(("p0", "p1", "p2")):
        tp[nm + "x"] = muv_rows[2 * k]
        tp[nm + "y"] = muv_rows[2 * k + 1]
    tp["p0p2x"] = tp["p0x"] - tp["p2x"]
    tp["p0p2y"] = tp["p0y"] - tp["p2y"]
    tp["p1p0x"] = tp["p1x"] - tp["p0x"]
    tp["p1p0y"] = tp["p1y"] - tp["p0y"]
    tp["p2p1x"] = tp["p2x"] - tp["p1x"]
    tp["p2p1y"] = tp["p2y"] - tp["p1y"]

    a_inc, b_inc = level_line_values_kernel(
        jnp, None, tp, px, py, gx, gy, gz, gw, size, rcp, alpha_cutoff,
        degenerate=False, fz=fz)
    above = jnp.where(mask, a_inc, zero_i).sum(axis=0, keepdims=True,
                                               dtype=jnp.int32)
    below = jnp.where(mask, b_inc, zero_i).sum(axis=0, keepdims=True,
                                               dtype=jnp.int32)

    kf = jax.lax.broadcasted_iota(jnp.int32, (Ke, B), 0)
    soff = sdy * We + sdx

    def pick(shift):
        sel = (kf == (soff + shift)).astype(jnp.float32)
        return (ext * sel).sum(axis=0, keepdims=True)

    a = pick(0)
    b = pick(We)
    c = pick(1)
    d = pick(We + 1)
    p0px = _g(jnp, muv_rows[0] * jnp.float32(float(size[0])),
              fz) - jnp.float32(0.5)
    p0py = _g(jnp, muv_rows[1] * jnp.float32(float(size[1])),
              fz) - jnp.float32(0.5)
    wxf = p0px - jnp.floor(p0px)
    wyf = p0py - jnp.floor(p0py)
    onef = jnp.float32(1.0)
    ac = _g(jnp, a * (onef - wxf), fz) + _g(jnp, c * wxf, fz)
    bd = _g(jnp, b * (onef - wxf), fz) + _g(jnp, d * wxf, fz)
    seed = _g(jnp, ac * (onef - wyf), fz) + _g(jnp, bd * wyf, fz)
    seed_above = cutoff < seed
    above = above + jnp.where(seed_above, one_i, zero_i)
    below = below + jnp.where(~seed_above, one_i, zero_i)

    return jnp.where(val, above, zero_i), jnp.where(val, below, zero_i)


@partial(jax.jit, static_argnames=("H", "W", "He", "We", "TSA", "size",
                                   "rcp", "alpha_cutoff", "nblk", "subdiv",
                                   "pad", "ntx", "period", "bf16x3"))
def _run_v3(tilesE, tidx, ids_r, uv6T, ccw1T, fzv=None, *, H, W, He, We,
            TSA, size, rcp, alpha_cutoff, nblk, subdiv, pad, ntx,
            period=None, bf16x3=False):
    """ids_r: (nblk, 1, B) int32 survivor ids (-1 = empty slot); uv6T:
    (6, T) fp32 per-item UV columns; ccw1T: (1, T) fp32 0/1 winding.  The
    kernel derives each slot's geometry from its id (bird curve + one-hot
    table lookup) — the host/XLA side scatters ONE int32 row per slot
    instead of 22 (scatters were the stage-C bottleneck on chip)."""
    kern = partial(_kernel_v3, H=H, W=W, He=He, We=We, TSA=TSA, size=size,
                   rcp=rcp, alpha_cutoff=alpha_cutoff, subdiv=subdiv,
                   pad=pad, ntx=ntx, period=period, bf16x3=bf16x3)
    if fzv is None:  # constant fallback: fence inert under interpret
        fzv = jnp.zeros((1, 1), jnp.int32)
    T = uv6T.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, TSA, TSA), lambda i, tidx_ref: (tidx_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, T), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, B), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, B), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
    )
    extra = {}
    if jax.default_backend() == "cpu":
        # no Mosaic on host: run the kernel body through the interpreter
        # (pure jax ops — works under jit/shard_map on the virtual mesh)
        extra["interpret"] = True
    a, b = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nblk, 1, B), jnp.int32),
                   jax.ShapeDtypeStruct((nblk, 1, B), jnp.int32)),
        **extra,
    )(tidx, tilesE, ids_r, uv6T, ccw1T, fzv)
    return a.reshape(nblk, B), b.reshape(nblk, B)


@partial(jax.jit, static_argnames=("H", "W", "He", "We", "TSA", "size",
                                   "rcp", "alpha_cutoff", "nblk", "subdiv",
                                   "pad", "ntx", "period", "bf16x3"))
def _run_v3_xla(tilesE, tidx, ids_r, uv6T, ccw1T, fzv=None, *, H, W, He,
                We, TSA, size, rcp, alpha_cutoff, nblk, subdiv, pad, ntx,
                period=None, bf16x3=False):
    """Pure-XLA execution of the SAME kernel body as `_run_v3` — the
    ComputeOnly engine's exact stage (reference role: the compute-shader
    rasterizer, bake_gpu_impl.cpp:253-267, vs the HW-raster path).

    The Mosaic grid becomes a chunked `lax.scan` whose step vmaps
    `_kernel_body` over CB tile blocks: the one-hot column/table selects
    batch into (CB, ...) `dot_general`s — still exact-0/1 operands at
    HIGHEST precision, so gather semantics stay bit-exact on the MXU —
    while the scan bounds live intermediates to CB blocks (a full vmap
    over ~1-2k blocks would materialize ~0.4 GB of column selects).
    Bit-exactness with the Mosaic engine is by construction: both run
    the identical `_kernel_body` jaxpr; callers must pass the runtime
    fence token `fzv` (XLA may contract fp32 mul+add; Mosaic does not,
    which is why the Pallas path may pass None)."""
    if fzv is None:
        fzv = jnp.zeros((1, 1), jnp.int32)
    fz = fzv[0, 0]
    # blocks vmapped per scan step: bounds live column-select
    # intermediates to CB * TSA * We*B fp32 while keeping the matmuls
    # batched.  v5e sweep (ComputeOnly spot, same window): 64 beats
    # 32/16 (361.1M vs 346.4/345.8M); 128 is a wash in a noisier
    # window (342.0 vs 338.8M) for 2x the live footprint — default 64,
    # OMM_XLA_CB overrides for sweeps.
    CB = min(int(os.environ.get("OMM_XLA_CB", "64")), nblk)
    nch = -(-nblk // CB)
    padb = nch * CB - nblk
    if padb:
        tidx_p = jnp.concatenate(
            [tidx, jnp.zeros((padb,), tidx.dtype)])
        ids_p = jnp.concatenate(
            [ids_r, jnp.full((padb, 1, B), -1, jnp.int32)])
    else:
        tidx_p, ids_p = tidx, ids_r

    def one_block(bt, ids_blk):
        region = tilesE[bt]
        geom_rows = derive_slot_geometry(
            ids_blk, uv6T, ccw1T, bt, fz, subdiv=subdiv, pad=pad,
            ntx=ntx, size=size, period=period)
        return _kernel_body(region, geom_rows, H=H, W=W, He=He, We=We,
                            RHe=TSA, RWe=TSA, size=size, rcp=rcp,
                            alpha_cutoff=alpha_cutoff, fz=fz,
                            bf16x3=bf16x3)

    def step(carry, x):
        bts, idsb = x
        return carry, jax.vmap(one_block)(bts, idsb)

    _, (a, b) = jax.lax.scan(
        step, None, (tidx_p.reshape(nch, CB),
                     ids_p.reshape(nch, CB, 1, B)))
    a = a.reshape(nch * CB, B)
    b = b.reshape(nch * CB, B)
    return (jax.lax.slice(a, (0, 0), (nblk, B)),
            jax.lax.slice(b, (0, 0), (nblk, B)))


def _halo_tiles(planeP, TS, TSA):
    """(nty*ntx, TSA, TSA) overlapping tiles, loop-free-ish (static slices)."""
    Hp, Wp = planeP.shape
    nty = -(-Hp // TS)
    ntx = -(-Wp // TS)
    padded = jnp.pad(planeP, ((0, nty * TS + TSA - Hp),
                              (0, ntx * TS + TSA - Wp)))
    row_bands = jnp.stack([
        jax.lax.slice(padded, (t * TS, 0), (t * TS + TSA, padded.shape[1]))
        for t in range(nty)], axis=0)  # (nty, TSA, Wp')
    tiles = jnp.stack([
        jax.lax.slice(row_bands, (0, 0, t * TS), (nty, TSA, t * TS + TSA))
        for t in range(ntx)], axis=1)  # (nty, ntx, TSA, TSA)
    return tiles.reshape(nty * ntx, TSA, TSA), nty, ntx


def prepare_jobs_v3(texture: Texture, cfg, uv_tri: np.ndarray, subdiv: int):
    """Tile-sorted schedule.  Returns the per-mip job list, or None when
    the fast path's preconditions fail."""
    if (cfg.filter != TextureFilterMode.Linear
            or cfg.disable_level_line
            or bool(geom.is_degenerate(uv_tri))
            # the kernel normalizes corners with the macro winding; thin
            # slivers where the oracle's per-micro-triangle winding could
            # disagree must take an oracle-order path
            or not bool(geom.winding_stable(uv_tri, subdiv))):
        return None
    border = cfg.addr_mode == TextureAddressMode.Border

    M = get_num_micro_triangles(subdiv)
    ccw = bool(geom.is_ccw(uv_tri))
    jobs = []
    from .. import bird as _bird
    muv0 = _bird.micro_triangle_uvs(
        uv_tri, np.arange(M, dtype=np.uint32), subdiv)  # mip-independent
    for mip in range(texture.mip_count):
        pc = mx._host_precompute(texture, uv_tri, subdiv, mip,
                                 candidates=(B,), muv=muv0)
        w, h = texture.size(mip)
        H, W = pc["H"], pc["W"]
        He, We = H + 2, W + 2
        TSA = TILE + max(He, We)
        pad = TSA  # generous: every window read stays in the padded plane
        if (pc["x0"].min() < 1 - pad or pc["y0"].min() < 1 - pad
                or pc["x0"].max() + We > w + pad
                or pc["y0"].max() + He > h + pad):
            return None
        if ((pc["sx"] < pc["x0"]).any() or (pc["sy"] < pc["y0"]).any()
                or (pc["sx"] > pc["x0"] + W).any()
                or (pc["sy"] > pc["y0"] + H).any()):
            return None
        if border:
            # Border seed quirk (see mxu_classify.classify_work_item_mxu):
            # require every seed 2x2 footprint in-bounds so the padded
            # plane's borderAlpha fill matches the oracle's seed reads.
            if ((pc["sx"] < 0).any() or (pc["sy"] < 0).any()
                    or (pc["sx"] > w - 2).any() or (pc["sy"] > h - 2).any()):
                return None

        info = texture.info[mip]
        planeH = mx.padded_plane(texture, mip, pad, cfg.addr_mode,
                                 float(cfg.border_alpha))
        bf16ok = bf16x3_safe(planeH) and bf16x3_policy("pallas")
        planeP = jnp.asarray(planeH)
        tilesE, nty, ntx = _halo_tiles(planeP, TILE, TSA)

        x0p = pc["x0"] + pad
        y0p = pc["y0"] + pad
        tx = x0p // TILE
        ty = y0p // TILE
        tile_id = (ty * ntx + tx).astype(np.int64)

        # Sort micro-tris by tile; pad each tile group to a multiple of B.
        order = np.argsort(tile_id, kind="stable")
        sorted_tid = tile_id[order]
        groups, counts = np.unique(sorted_tid, return_counts=True)
        padded_counts = ((counts + B - 1) // B) * B
        padM = int(padded_counts.sum())
        if padM > 4 * M + 8 * B:  # excessive padding -> fall back
            return None
        nblk = padM // B

        sel = np.full(padM, -1, np.int64)  # source micro-tri per slot
        block_tile = np.empty(nblk, np.int32)
        pos = 0
        src = 0
        for g, cnt, pcnt in zip(groups, counts, padded_counts):
            sel[pos:pos + cnt] = order[src:src + cnt]
            for bslot in range(pcnt // B):
                block_tile[(pos // B) + bslot] = g
            pos += pcnt
            src += cnt

        valid = sel >= 0
        # slot ids: item t=0, so flat id == micro-tri index; -1 = empty
        ids_r = jnp.asarray(
            np.where(valid, sel, -1).astype(np.int32).reshape(nblk, 1, B))
        uv6T = jnp.asarray(uv_tri.reshape(6, 1).astype(np.float32))
        ccw1T = jnp.asarray(
            np.array([[1.0 if ccw else 0.0]], np.float32))

        jobs.append(dict(
            args=(tilesE, jnp.asarray(block_tile), ids_r, uv6T, ccw1T),
            kw=dict(H=H, W=W, He=He, We=We, TSA=TSA, size=(w, h),
                    rcp=(float(info.rcp_size[0]), float(info.rcp_size[1])),
                    alpha_cutoff=float(cfg.alpha_cutoff), nblk=nblk,
                    subdiv=subdiv, pad=pad, ntx=ntx, bf16x3=bf16ok),
            sel=sel, valid=valid, M=M))
    return jobs


def run_job_v3(job):
    import numpy as _np
    fzv = jnp.asarray(_np.zeros((1, 1), _np.int32)) if kernel_fence() else None
    return _run_v3(*job["args"], fzv, **job["kw"])


def gather_v3(job, a_b, b_b):
    """Scatter per-slot results back to bird order."""
    M = job["M"]
    a = np.zeros(M, np.int64)
    bb = np.zeros(M, np.int64)
    flat_a = np.asarray(a_b).reshape(-1)
    flat_b = np.asarray(b_b).reshape(-1)
    v = job["valid"]
    a[job["sel"][v]] = flat_a[v]
    bb[job["sel"][v]] = flat_b[v]
    return a, bb
