"""Micro-triangle classification kernels (the bake hot loop).

This is the TPU-native formulation of the reference per-texel kernels:

  LevelLineIntersectionKernel   bake_kernels_cpu.h:241-399
  ConservativeBilinearKernel    bake_kernels_cpu.h:404-452
  conservative raster accept    util/cpu_raster.h:277-383 (OverConservative)

The reference walks texels with a scanline rasterizer and invokes a scalar
callback per covered texel.  Because classification is a commutative integer
reduction over covered texels, we instead evaluate ALL texels of each
micro-triangle's padded AABB densely with a conservative-raster *mask* —
identical visited set (the accept region per row is an interval, so the
reference's early-out changes nothing) — which vectorizes over
(micro-triangle, texel-row, texel-col) and runs unchanged under numpy and
jax.numpy (pass xp=jnp inside jit).

All arithmetic is fp32 with the reference's operation order preserved; the
parity oracle is exact equality of Debug::Stats against the reference test
suite's hard-coded values.
"""
from __future__ import annotations

import numpy as np

from ..texture import gather_tex_coord4
from ..types import (Format, OpacityState, TextureAddressMode,
                     UnknownStatePromotion)

F32 = np.float32


def _f32(xp, v):
    return xp.float32(v)


def guard(xp, v, fz=None):
    """fp-contraction fence.

    XLA:CPU's LLVM backend contracts `a*b + c` into FMA regardless of the
    fast-math flags (ffp-contract), changing fp32 results vs the numpy
    oracle; XLA deletes optimization barriers and folds constant fences,
    so the only robust fence is an integer XOR with a RUNTIME zero (fz, an
    int32 jit argument that is always 0).  No-op under numpy or when no
    token is supplied (e.g. inside Mosaic kernels, whose codegen does not
    contract).  Verified by the foliage-content parity tests
    (tests/test_scene_e2e.py) which flip without it."""
    if xp is np or fz is None:
        return v
    from jax import lax
    i = lax.bitcast_convert_type(v, xp.int32) ^ fz
    return lax.bitcast_convert_type(i, xp.float32)


def is_zero(xp, v, eps=1e-6):
    """IsZero (bake_kernels_cpu.h:135-137): |v| < eps via two compares."""
    e = _f32(xp, eps)
    return (v < e) & (v > -e)


def exact_sqrt(xp, x):
    """Correctly-rounded (IEEE RN) fp32 sqrt.

    numpy's sqrt is already correctly rounded; XLA's fp32 sqrt (CPU
    fast-math and the TPU VPU) is an rsqrt refinement that is 1-2 ulp off
    on ~40% of inputs — enough to flip the level-line hit tests after
    cancellation (the hyperbola root feeds `k*hx + m` with |k| up to 1e7).
    The fix: take the device sqrt, then pick among its ulp neighbors the
    candidate whose exactly-computed square (Veltkamp split, all exact
    fp32 products) is closest to x.  Arguments outside the safe exponent
    range are pre-scaled by an even power of two (exact).
    """
    if xp is np:
        return np.sqrt(x)
    import jax

    # keep the split/squares away from subnormal/overflow trouble
    lo = jnp_f32(xp, 2.0 ** -40)
    hi = jnp_f32(xp, 2.0 ** 40)
    scale_up = x < lo
    scale_dn = x > hi
    x_s = xp.where(scale_up, x * jnp_f32(xp, 2.0 ** 52),
                   xp.where(scale_dn, x * jnp_f32(xp, 2.0 ** -52), x))

    # One exact-residual Newton step pulls the device sqrt (measured up
    # to 3 ulp off on the TPU VPU) to sub-ulp accuracy: e0 = y^2 - x is
    # computed EXACTLY via a Veltkamp split (Sterbenz: y^2 within 2x of
    # x), so y1 = y - e0/(2y) has error ~2^-23 ulp + final rounding.  A
    # +-1-ulp candidate check with incrementally-updated exact errors
    # then settles the round-to-nearest winner regardless of the device
    # sqrt's error bound.
    y = xp.sqrt(x_s)
    big = y * jnp_f32(xp, 4097.0)
    ch = big - (big - y)
    cl = y - ch
    e0 = (ch * ch - x_s) + jnp_f32(xp, 2.0) * ch * cl + cl * cl
    y = y - e0 / (jnp_f32(xp, 2.0) * y)
    yi = jax.lax.bitcast_convert_type(y, xp.int32)
    big = y * jnp_f32(xp, 4097.0)
    ch = big - (big - y)
    cl = y - ch
    e0 = (ch * ch - x_s) + jnp_f32(xp, 2.0) * ch * cl + cl * cl
    two_y = jnp_f32(xp, 2.0) * y
    best_err = None
    best_y = None
    for off in (-1, 0, 1):
        c = jax.lax.bitcast_convert_type(yi + xp.int32(off), xp.float32)
        d = c - y
        err = xp.abs(e0 + two_y * d + d * d)
        if best_err is None:
            best_err, best_y = err, c
        else:
            take = err < best_err
            best_err = xp.where(take, err, best_err)
            best_y = xp.where(take, c, best_y)
    r = xp.where(scale_up, best_y * jnp_f32(xp, 2.0 ** -26),
                 xp.where(scale_dn, best_y * jnp_f32(xp, 2.0 ** 26),
                          best_y))
    ok = (x > jnp_f32(xp, 0.0)) & xp.isfinite(x)
    return xp.where(ok, r, xp.sqrt(x))


def jnp_f32(xp, v):
    return xp.float32(v)


def _length(xp, dx, dy, fz=None):
    """glm::length of a float2 = sqrt(dot(v, v)) in fp32 (correctly
    rounded on every backend, contraction-safe)."""
    return exact_sqrt(xp, guard(xp, dx * dx, fz) + guard(xp, dy * dy, fz))


def edge_hyperbola_hit(xp, p0x, p0y, p1x, p1y, ha, hb, hc, hd, fz=None):
    """TestEdgeHyperbolaIntersection (bake_kernels_cpu.h:144-238), vectorized.

    Edge endpoints (p0, p1) in texel-local coordinates; hyperbola
    f(x,y) = ha + hb*x + hc*y + hd*x*y = 0.  Returns bool array.
    """
    one = _f32(xp, 1.0)
    half = _f32(xp, 0.5)

    # Swap so p0.x <= p1.x.
    swap = p0x > p1x
    q0x = xp.where(swap, p1x, p0x)
    q0y = xp.where(swap, p1y, p0y)
    q1x = xp.where(swap, p0x, p1x)
    q1y = xp.where(swap, p0y, p1y)

    edge_len = _length(xp, q1x - q0x, q1y - q0y, fz)

    def on_edge(px, py):
        l = _length(xp, px - q0x, py - q0y, fz) \
            + _length(xp, px - q1x, py - q1y, fz) - edge_len
        return is_zero(xp, l, 1e-5)

    def in_unit_square(px, py):
        zero = _f32(xp, 0.0)
        return (px >= zero) & (px <= one) & (py >= zero) & (py <= one)

    def point_hit(px, py):
        return in_unit_square(px, py) & on_edge(px, py)

    k_denum = q1x - q0x
    vertical = is_zero(xp, k_denum)

    # --- vertical edge branch (bake_kernels_cpu.h:161-180) ---
    vx = q0x
    v_c0 = guard(xp, hd * vx, fz) + hc
    v_c1 = ha + guard(xp, hb * vx, fz)
    v_c0_safe = xp.where(is_zero(xp, v_c0), one, v_c0)
    vy = -v_c1 / v_c0_safe

    # --- general branch (bake_kernels_cpu.h:181-234) ---
    k_den_safe = xp.where(vertical, one, k_denum)
    k = (q1y - q0y) / k_den_safe
    m = q1y - guard(xp, q1x * k, fz)
    c0 = hd * k
    c1 = guard(xp, hc * k, fz) + guard(xp, hd * m, fz) + hb
    c2 = ha + guard(xp, hc * m, fz)
    c0_zero = is_zero(xp, c0)

    # straight-line sub-branch candidate
    c1_safe = xp.where(is_zero(xp, c1), one, c1)
    lx = -c2 / c1_safe
    ly = guard(xp, k * lx, fz) + m

    # hyperbola sub-branch candidates
    inner = guard(xp, c1 * c1, fz) - guard(xp, (_f32(xp, 4.0) * c0) * c2, fz)
    real = inner > _f32(xp, 0.0)
    root = exact_sqrt(xp, xp.where(real, inner, _f32(xp, 0.0)))
    c0_safe = xp.where(c0_zero, one, c0)
    hx0 = half * (-c1 + root) / c0_safe
    hx1 = half * (-c1 - root) / c0_safe
    hy0 = guard(xp, k * hx0, fz) + m
    hy1 = guard(xp, k * hx1, fz) + m

    # The three branches are mutually exclusive per lane, so select the
    # branch's candidate point(s) FIRST and run the expensive point test
    # (two correctly-rounded sqrts each) only twice instead of four
    # times.  Selected lanes see bit-identical coordinates, so this is
    # exactly the reference's branch structure (bake_kernels_cpu.h:
    # 161-234); the dummy second point (x=2) fails in_unit_square before
    # its on_edge value matters.
    pax = xp.where(vertical, vx, xp.where(c0_zero, lx, hx0))
    pay = xp.where(vertical, vy, xp.where(c0_zero, ly, hy0))
    two = _f32(xp, 2.0)
    pbx = xp.where(vertical | c0_zero, two, hx1)
    pby = xp.where(vertical | c0_zero, two, hy1)
    # boolean logic (not i1 selects) for Mosaic compatibility
    gate = ((vertical & ~is_zero(xp, v_c0))
            | (~vertical & c0_zero & ~is_zero(xp, c1))
            | (~vertical & ~c0_zero & real))
    return gate & (point_hit(pax, pay) | point_hit(pbx, pby))


def point_in_tri_cached(xp, tp, px, py, fz=None):
    """Triangle::PointInTriangle (geometry.h:101-114).

    tp: dict with keys p0x..p2y, cached edge diffs p0p2/p1p0/p2p1 (fp32
    arrays broadcastable against px/py)."""
    zero = _f32(xp, 0.0)
    s = guard(xp, tp["p0p2x"] * (py - tp["p2y"]), fz) \
        - guard(xp, tp["p0p2y"] * (px - tp["p2x"]), fz)
    t = guard(xp, tp["p1p0x"] * (py - tp["p0y"]), fz) \
        - guard(xp, tp["p1p0y"] * (px - tp["p0x"]), fz)
    early_false = ((s < zero) != (t < zero)) & (s != zero) & (t != zero)
    d = guard(xp, tp["p2p1x"] * (py - tp["p1y"]), fz) \
        - guard(xp, tp["p2p1y"] * (px - tp["p1x"]), fz)
    ok = (d == zero) | ((d < zero) == ((s + t) <= zero))
    return (~early_false) & ok


def make_tri_params(xp, tri):
    """Precompute cached point-in-triangle diffs for (..., 3, 2) fp32 tris,
    broadcastable over trailing texel axes (adds two axes)."""
    t = xp.asarray(tri, dtype=xp.float32)

    def g(i, j):
        return t[..., i, j][..., None, None]

    p = {
        "p0x": g(0, 0), "p0y": g(0, 1),
        "p1x": g(1, 0), "p1y": g(1, 1),
        "p2x": g(2, 0), "p2y": g(2, 1),
    }
    p["p0p2x"] = p["p0x"] - p["p2x"]
    p["p0p2y"] = p["p0y"] - p["p2y"]
    p["p1p0x"] = p["p1x"] - p["p0x"]
    p["p1p0y"] = p["p1y"] - p["p0y"]
    p["p2p1x"] = p["p2x"] - p["p1x"]
    p["p2p1y"] = p["p2y"] - p["p1y"]
    return p


def conservative_raster_mask(xp, q, x, y, fz=None):
    """Over-conservative Pineda edge-test accept mask
    (cpu_raster.h:102-124 SquareInTriangleSkipAABBTest via :304-333).

    q: (..., 3, 2) fp32 CCW-normalized raster-space triangle.
    x, y: int texel coords broadcastable to (..., H, W).
    Returns bool mask of texels whose unit square passes the conservative
    edge functions.
    """
    zero = _f32(xp, 0.0)
    sx = x.astype(xp.float32)
    sy = y.astype(xp.float32)
    acc = None
    for e in range(3):
        px = q[..., e, 0][..., None, None]
        py = q[..., e, 1][..., None, None]
        qx = q[..., (e + 1) % 3, 0][..., None, None]
        qy = q[..., (e + 1) % 3, 1][..., None, None]
        nx = qy - py
        ny = px - qx
        c = -(guard(xp, nx * px, fz) + guard(xp, ny * py, fz))
        ev = (guard(xp, nx * sx, fz) + guard(xp, ny * sy, fz)) + c
        bx = xp.where(nx > zero, zero, nx)
        by = xp.where(ny > zero, zero, ny)
        ok = (ev + bx + by) < zero
        acc = ok if acc is None else (acc & ok)
    return acc


def level_line_texel_kernel(xp, tri_uv, tri_params, px_i, py_i, texture_planes,
                            tex_size, tex_size_log2, tex_is_pow2,
                            rcp_size, addr_mode, alpha_cutoff, border_alpha,
                            degenerate: bool, aabb_s=None, aabb_e=None,
                            fz=None):
    """Per-(micro-tri, texel) increments of the level-line kernel
    (bake_kernels_cpu.h:241-399).

    tri_uv: (..., 3, 2) fp32 micro-tri in UV space (unscaled).
    px_i, py_i: int32 texel coords (..., H, W).
    texture_planes: fp32 (h, w) alpha plane of this mip.
    Returns (above_inc, below_inc) int32 arrays (values 0..2).
    """
    coords = xp.stack([px_i, py_i], axis=-1)
    c00, c10, c01, c11 = gather_tex_coord4(
        addr_mode, coords, np.array(tex_size, np.int32),
        np.array(tex_size_log2, np.int32), tex_is_pow2, xp)

    plane = xp.asarray(texture_planes)
    w_i = np.int32(tex_size[0])
    h_i = np.int32(tex_size[1])

    def load(cc):
        cx = cc[..., 0]
        cy = cc[..., 1]
        if addr_mode == TextureAddressMode.Border:
            is_border = (cx == np.int32(0x7FFFFFFE)) | (cy == np.int32(0x7FFFFFFE))
            sx = xp.where(is_border, 0, xp.clip(cx, 0, w_i - 1))
            sy = xp.where(is_border, 0, xp.clip(cy, 0, h_i - 1))
            return xp.where(is_border, _f32(xp, border_alpha), plane[sy, sx])
        return plane[cy, cx]

    # Gather order matches the kernel: x=c00, y=c01, z=c11, w=c10
    # (bake_kernels_cpu.h:259-273).
    gx = load(c00)
    gy = load(c01)
    gz = load(c11)
    gw = load(c10)

    return level_line_values_kernel(
        xp, tri_uv, tri_params, px_i, py_i, gx, gy, gz, gw, tex_size,
        rcp_size, alpha_cutoff, degenerate, aabb_s=aabb_s, aabb_e=aabb_e,
        fz=fz)


def level_line_values_kernel(xp, tri_uv, tri_params, px_i, py_i,
                             gx, gy, gz, gw, tex_size, rcp_size,
                             alpha_cutoff, degenerate: bool,
                             aabb_s=None, aabb_e=None, fz=None):
    """Core level-line math with the 2x2 quad values already fetched.

    Shared by the gather path above and the MXU one-hot-matmul path
    (kernels/mxu_classify.py) so the fp32 op order is identical everywhere.
    tri_uv accessors add two trailing broadcast axes (see make_tri_params).
    """
    cutoff = _f32(xp, alpha_cutoff)
    half = _f32(xp, 0.5)

    sizef_x = _f32(xp, float(tex_size[0]))
    sizef_y = _f32(xp, float(tex_size[1]))
    inv_x = _f32(xp, float(rcp_size[0]))
    inv_y = _f32(xp, float(rcp_size[1]))

    pixelf_x = px_i.astype(xp.float32) + half
    pixelf_y = py_i.astype(xp.float32) + half
    invpix_x = pixelf_x * inv_x
    invpix_y = pixelf_y * inv_y

    zero_i = xp.int32(0)
    one_i = xp.int32(1)
    above = zero_i
    below = zero_i

    if not degenerate:
        # Corner-in-triangle extremum search (bake_kernels_cpu.h:276-331).
        op0 = cutoff < gx
        op1 = cutoff < gy
        op2 = cutoff < gz
        op3 = cutoff < gw
        in0 = point_in_tri_cached(xp, tri_params, invpix_x, invpix_y, fz)
        in1 = point_in_tri_cached(xp, tri_params, invpix_x, invpix_y + inv_y, fz)
        in2 = point_in_tri_cached(xp, tri_params, invpix_x + inv_x, invpix_y + inv_y, fz)
        in3 = point_in_tri_cached(xp, tri_params, invpix_x + inv_x, invpix_y, fz)
        is_op = (in0 & op0) | (in1 & op1) | (in2 & op2) | (in3 & op3)
        is_tr = (in0 & ~op0) | (in1 & ~op1) | (in2 & ~op2) | (in3 & ~op3)
        above = above + xp.where(is_op, one_i, zero_i)
        below = below + xp.where(is_tr, one_i, zero_i)
        early_done = is_op & is_tr
    else:
        early_done = xp.zeros(gx.shape, dtype=bool)

    # Level-line section (bake_kernels_cpu.h:333-398).
    a = gx
    b = gw - gx
    c = gy - gx
    d = gx + gz - gy - gw
    uniform = is_zero(xp, b) & is_zero(xp, c) & is_zero(xp, d)
    uni_above = uniform & (cutoff < a)
    uni_below = uniform & ~(cutoff < a)

    ha = a - cutoff
    if degenerate:
        # Degenerate path intersects the AABB diagonal segment
        # (bake_kernels_cpu.h:358-374).
        e0x = guard(xp, sizef_x * aabb_s[..., 0][..., None, None], fz) - pixelf_x
        e0y = guard(xp, sizef_y * aabb_s[..., 1][..., None, None], fz) - pixelf_y
        e1x = guard(xp, sizef_x * aabb_e[..., 0][..., None, None], fz) - pixelf_x
        e1y = guard(xp, sizef_y * aabb_e[..., 1][..., None, None], fz) - pixelf_y
        hit = edge_hyperbola_hit(xp, e0x, e0y, e1x, e1y, ha, b, c, d, fz)
    else:
        corner = [(tri_params["p0x"], tri_params["p0y"]),
                  (tri_params["p1x"], tri_params["p1y"]),
                  (tri_params["p2x"], tri_params["p2y"])]
        hit = None
        for e in range(3):
            p0x = guard(xp, sizef_x * corner[e][0], fz) - pixelf_x
            p0y = guard(xp, sizef_y * corner[e][1], fz) - pixelf_y
            p1x = guard(xp, sizef_x * corner[(e + 1) % 3][0], fz) - pixelf_x
            p1y = guard(xp, sizef_y * corner[(e + 1) % 3][1], fz) - pixelf_y
            h = edge_hyperbola_hit(xp, p0x, p0y, p1x, p1y, ha, b, c, d, fz)
            hit = h if hit is None else (hit | h)

    ll_above = uni_above | (~uniform & hit)
    ll_below = uni_below | (~uniform & hit)
    skip_ll = early_done
    above = above + xp.where(~skip_ll & ll_above, one_i, zero_i)
    below = below + xp.where(~skip_ll & ll_below, one_i, zero_i)
    return above, below


def get_state_from_coverage(xp, fmt: Format, mode: UnknownStatePromotion,
                            cutoff_gt: OpacityState, cutoff_le: OpacityState,
                            above, below):
    """GetStateFromCoverage (bake_kernels_cpu.h:25-61), vectorized over
    (above, below) int arrays; returns int32 state array."""
    def unknown_of(s: OpacityState) -> int:
        # GetUnknownVersionOf: T->UT, O->UO; already-unknown stays.
        if s == OpacityState.Transparent:
            return int(OpacityState.UnknownTransparent)
        if s == OpacityState.Opaque:
            return int(OpacityState.UnknownOpaque)
        return int(s)

    is_unknown = (above != 0) & (below != 0)
    if fmt == Format.OC1_4_State:
        if mode == UnknownStatePromotion.ForceOpaque:
            unk = xp.int32(int(OpacityState.UnknownOpaque))
        elif mode == UnknownStatePromotion.ForceTransparent:
            unk = xp.int32(int(OpacityState.UnknownTransparent))
        else:  # Nearest
            unk = xp.where(above >= below, xp.int32(unknown_of(cutoff_gt)),
                           xp.int32(unknown_of(cutoff_le)))
    else:
        if mode == UnknownStatePromotion.ForceOpaque:
            unk = xp.int32(int(OpacityState.Opaque))
        elif mode == UnknownStatePromotion.ForceTransparent:
            unk = xp.int32(int(OpacityState.Transparent))
        else:
            unk = xp.where(above >= below, xp.int32(int(cutoff_gt)),
                           xp.int32(int(cutoff_le)))
    known = xp.where(above == 0, xp.int32(int(cutoff_le)),
                     xp.int32(int(cutoff_gt)))
    return xp.where(is_unknown, unk, known)
