"""Hierarchical two-phase micro-triangle classification (production path).

The reference resolves easy micro-triangles with a SAT box test
(impl::ResampleCoarse, bake_cpu_impl.cpp:715-808) before running the
per-texel level-line kernel on the rest.  This module is the TPU-native
generalization, applied *inside* the fine pass and structured for a
high-latency host link: a batch of work items runs as a device-resident
pipeline with exactly two host synchronizations.

Levels of resolution (all on device):

  A. GROUP resolve.  The bird curve is hierarchical: micro-triangles
     [g*4^k, (g+1)*4^k) are exactly the subtriangle with curve index g at
     subdivision level lg = L-k (bird.h:57-118 recursion).  A separable
     min/max filter over the wrap-mode pre-padded alpha plane produces an
     int8 "class plane" (+1 all-above / -1 all-below / 0 mixed for the
     window anchored at each texel); ONE gather per group classifies all
     its members at once when the group's texel window sits strictly on
     one side of the alpha cutoff.  This is exact: GetStateFromCoverage
     (bake_kernels_cpu.h:25-61) consults the above/below counts only when
     BOTH are non-zero, and a one-sided window forces every per-texel
     increment (corner tests, level-line hits, bilinear seed) to the same
     side.  A relative safety margin (PHASE1_MARGIN) keeps every
     borderline texel — where fp32 rounding inside the reference op order
     could land a value on the other side — in the mixed class.
  B. MICRO resolve.  Members of unresolved groups (the alpha-contour
     neighborhood, O(perimeter) of the O(area) total) get the same
     one-gather test with a micro-triangle-sized window.
  C. EXACT kernel.  True survivors — windows straddling the cutoff — run
     the bit-exact level-line Pallas kernel (pallas_classify._run_v3),
     tile-sorted across the whole batch.  Survivor compaction, tile
     sorting, group padding and the per-slot geometry stream are all
     built on device; the host only reads the survivor counts (sync #1)
     to pick power-of-two capacity buckets, then fetches a compressed
     payload — phase-1 side classes plus exact survivor states, 2-bit
     packed, ~10x smaller than the full state array — and reconstructs
     the per-micro-tri states host-side (sync #2).  In speculative
     steady state both syncs collapse into the one compressed fetch.

Multi-mip bakes (bake_cpu_impl.cpp:872-911) resolve at level A/B only
when every mip agrees on the same side; anything else — including
opposite-side mips, where the counts feed the Nearest-promotion
comparison `above >= below` — runs the exact kernel for ALL mips,
preserving the reference's count arithmetic and early-unknown-exit.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bird, geom
from ..texture import Texture
from ..types import (OpacityState, TextureAddressMode, TextureFilterMode,
                     get_num_micro_triangles)
from . import fallback as fb
from . import mxu_classify as mx
from . import pallas_classify as pk

UO = int(OpacityState.UnknownOpaque)
UT = int(OpacityState.UnknownTransparent)
B = pk.B
TILE = pk.TILE

# Relative margin below which the window test refuses to resolve: ~6e-5 of
# the value scale, orders of magnitude above the <= 8-ulp (~5e-7) rounding
# slack of the reference's bilinear/quadratic fp32 chains.
PHASE1_MARGIN = float(np.float32(2.0 ** -14))

_INVALID_TILE = np.int32(0x7FFFFF00)
_SENTINEL = np.int32(0x7FFFFF00)

# Per-process device-resident constants: creating jnp.int32(0) / the
# all-active (1,1) mask per batch costs one H2D transfer each — every
# stream operation pays the tunnel's fixed RPC overhead.
_dev_consts: dict = {}


def _fz0():
    c = _dev_consts.get("fz0")
    if c is None:
        c = _dev_consts["fz0"] = jnp.int32(0)
    return c


def _act_all():
    c = _dev_consts.get("act_all")
    if c is None:
        c = _dev_consts["act_all"] = jnp.ones((1, 1), bool)
    return c


# ---------------------------------------------------------------------------
# caches
# ---------------------------------------------------------------------------

def _tex_cache(texture: Texture) -> dict:
    c = getattr(texture, "_omm_dev_cache", None)
    if c is None:
        c = {}
        texture._omm_dev_cache = c
    return c


def _period_for(texture: Texture, addr_mode, mip: int):
    """Address-mode period (Pw, Ph) in texels, or None for aperiodic
    modes.  Wrap repeats every w texels, Mirror every 2w
    (texture.h:34-70); Clamp/Border/MirrorOnce are not periodic."""
    w, h = texture.size(mip)
    if addr_mode == TextureAddressMode.Wrap:
        return (w, h)
    if addr_mode == TextureAddressMode.Mirror:
        return (2 * w, 2 * h)
    return None


def _wrap_origin(x0, y0, period):
    """Wrap a window origin into the canonical period (jnp true mod);
    no-op for aperiodic modes (period None)."""
    if period is None:
        return x0, y0
    return x0 % jnp.int32(period[0]), y0 % jnp.int32(period[1])


def _planes_cached(texture: Texture, mip: int, addr_mode, pad: int, TSA: int,
                   border_alpha: float = 0.0, period=None):
    key = ("tiles", mip, int(addr_mode), pad, TSA, float(border_alpha),
           period)
    c = _tex_cache(texture)
    if key not in c:
        planeH = mx.padded_plane(texture, mip, pad, addr_mode,
                                 border_alpha, period=period)
        bf16ok = pk.bf16x3_safe(planeH)
        planeP = jnp.asarray(planeH)
        tilesE, nty, ntx = pk._halo_tiles(planeP, TILE, TSA)
        c[key] = (planeP, tilesE, nty, ntx, bf16ok)
    return c[key]


# ---------------------------------------------------------------------------
# window classes
# ---------------------------------------------------------------------------

def _span_window(texture: Texture, uv_tri: np.ndarray, level: int, mip: int):
    """Conservative static (H, W) texel window class for subtriangles at
    `level`: upper bound on the clipped AABB extent (a subtriangle is the
    macro triangle scaled by 2^-level)."""
    Hb, Wb = _span_windows(texture, uv_tri[None], level, mip)
    return int(Hb[0]), int(Wb[0])


def _span_windows(texture: Texture, uv_arr: np.ndarray, level: int,
                  mip: int):
    """Batched _span_window: uv_arr (N, 3, 2) -> (Hb, Wb) int64 (N,)
    arrays, elementwise-identical to the scalar version (same fp64 op
    order) — host batch prep is per-batch hot (profiled ~17 ms/batch in
    scalar form, dominated by hundreds of these calls)."""
    w, h = texture.size(mip)
    q = np.asarray(uv_arr, np.float64) * np.array([w, h], np.float64)
    span = (q.max(axis=1) - q.min(axis=1)) * 2.0 ** -level
    Wb = np.ceil(span[:, 0] * (1.0 + 1e-5)).astype(np.int64) + 2
    Hb = np.ceil(span[:, 1] * (1.0 + 1e-5)).astype(np.int64) + 2
    return Hb, Wb


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _bucket(n: int) -> int:
    """Smallest capacity in {2^k, 1.5*2^k} >= n: tight enough to bound
    wasted device work, coarse enough to bound recompiles."""
    p = _next_pow2(max(n, 1))
    if (p // 4) * 3 >= n:
        return (p // 4) * 3
    return p


@partial(jax.jit, static_argnames=("Hb", "Wb", "cutoff", "margin"))
def _class_plane_jit(planeP, *, Hb, Wb, cutoff, margin):
    return _class_plane(planeP, Hb, Wb, cutoff, margin)


def _cls_cached(texture: Texture, mip: int, addr_mode, pad: int, TSA: int,
                Hb: int, Wb: int, cutoff: float, margin: float,
                border_alpha: float = 0.0, period=None):
    """Device-cached int8 class plane (textures are reused across many
    batches; the min/max filters run once per window class)."""
    key = ("cls", mip, int(addr_mode), pad, TSA, Hb, Wb, cutoff, margin,
           float(border_alpha), period)
    c = _tex_cache(texture)
    if key not in c:
        planeP, _, _, _, _ = _planes_cached(texture, mip, addr_mode, pad,
                                            TSA, border_alpha, period)
        c[key] = _class_plane_jit(planeP, Hb=Hb, Wb=Wb, cutoff=cutoff,
                                  margin=margin)
    return c[key]


# ---------------------------------------------------------------------------
# device building blocks (column layout throughout: no (N, 3, 2) arrays)
# ---------------------------------------------------------------------------

# column-form bird index/corner math shared with the Pallas kernel (the
# kernel derives slot geometry in-kernel from survivor ids — one source
# of truth keeps XLA and Mosaic paths bit-identical)
_bary_cols = pk.bary_cols
_corner_cols = pk.corner_cols


def _class_plane(planeP, Hb, Wb, cutoff, margin):
    """int8 plane: value at (y, x) classifies the (Hb+2, Wb+2) window
    anchored there (+1 strictly above, -1 strictly below, 0 mixed).

    Window-size derivation (why +2 suffices): lookups anchor at
    x0-1 with x0 = floor(qmin), q = u*w - 0.5 (_window_origin).  The
    exact kernel's reads for an entity with fp32 raster span S are
    cells [floor(qmin), ceil(qmax)) plus the +1-texel bilinear
    footprint (gather_tex_coord4) -> texels [x0, x0+ceil(S)+1], with
    ceil(S) <= Wb-2 (_span_window's float64 span + eps + 2).  Group
    levels add <=1 texel on each end for member-corner fp32 interp
    under/overshoot vs the group hull.  Total: [x0-1, x0+Wb] subset of
    the [x0-1, x0+Wb+1) window anchored at x0-1.  (Round-1 used +4 —
    two texels of pure slack per axis that widened the unresolved band
    at the finest level by ~30%.)"""
    inf = jnp.float32(np.inf)
    wmin = jax.lax.reduce_window(planeP, inf, jax.lax.min,
                                 (Hb + 2, 1), (1, 1), "VALID")
    wmin = jax.lax.reduce_window(wmin, inf, jax.lax.min,
                                 (1, Wb + 2), (1, 1), "VALID")
    wmax = jax.lax.reduce_window(planeP, -inf, jax.lax.max,
                                 (Hb + 2, 1), (1, 1), "VALID")
    wmax = jax.lax.reduce_window(wmax, -inf, jax.lax.max,
                                 (1, Wb + 2), (1, 1), "VALID")
    cut = jnp.float32(cutoff)
    mrg = jnp.float32(margin)
    scale = jnp.maximum(jnp.float32(1.0),
                        jnp.maximum(jnp.abs(wmin), jnp.abs(wmax)))
    delta = scale * mrg
    return jnp.where(wmin > cut + delta, jnp.int8(1),
                     jnp.where(wmax < cut - delta, jnp.int8(-1),
                               jnp.int8(0)))


def _window_origin(tri6, bu, bv, bd, w, h, fz=None):
    """floor(min corner * size - 0.5) per element (column form), minus the
    one-texel insurance applied by the caller."""
    (ax, ay), (bx, by), (cx, cy) = _corner_cols(tri6, bu, bv, bd, fz)
    wf = jnp.float32(float(w))
    hf = jnp.float32(float(h))
    half = jnp.float32(0.5)
    from .levelline import guard
    qxm = guard(jnp, jnp.minimum(jnp.minimum(ax, bx), cx) * wf, fz) - half
    qym = guard(jnp, jnp.minimum(jnp.minimum(ay, by), cy) * hf, fz) - half
    return (jnp.floor(qxm).astype(jnp.int32),
            jnp.floor(qym).astype(jnp.int32))


def _tri6_of(uv_flat, t):
    u = uv_flat[t]
    return tuple(u[..., k] for k in range(6))


def _sides_for(ids, tvec, level, uv_flat, planes_cls, mips, pads,
               fz=None, periods=None):
    """Combined-over-mips side for subtriangles given by curve index
    `ids` at `level` belonging to item `tvec` (column arrays).

    For periodic address modes the class planes cover one period + apron
    and the anchor wraps modularly (window VALUES are period-invariant,
    so the lookup is exact for any UV repeat)."""
    bu, bv, bd = _bary_cols(ids.astype(jnp.uint32), level)
    tri6 = _tri6_of(uv_flat, tvec)
    side = None
    for mi, (w, h) in enumerate(mips):
        pad = pads[mi]
        x0, y0 = _window_origin(tri6, bu, bv, bd, w, h, fz)
        x0, y0 = _wrap_origin(x0, y0, periods[mi] if periods else None)
        cls = planes_cls[mi]
        yy = y0 - 1 + pad
        xx = x0 - 1 + pad
        if _FLAT_GATHER:
            # A/B knob: one linear gather instead of XLA's 2-D gather;
            # explicit per-axis clips reproduce the 2-D form's
            # out-of-range clamp semantics exactly
            H2, W2 = cls.shape
            yy = jnp.clip(yy, 0, H2 - 1)
            xx = jnp.clip(xx, 0, W2 - 1)
            s = cls.reshape(-1)[yy * jnp.int32(W2) + xx]
        else:
            s = cls[yy, xx]
        if side is None:
            side = s
        else:
            side = jnp.where(s == side, side, jnp.int8(0))
    return side


# ---------------------------------------------------------------------------
# stage A+B: group resolve, micro resolve, survivor compaction, tile slots
# ---------------------------------------------------------------------------

def _fast_path_mask(texture: Texture, cfg, uv_arr: np.ndarray,
                    subdiv: int, lg: int) -> np.ndarray:
    """Vectorized `_fast_path_ok` over uv_arr (N, 3, 2): identical
    per-item decisions (same fp64 op order via _span_windows), one numpy
    pass per mip instead of N python loops — the per-item form profiled
    at ~7 ms per 64-item batch on the enqueue critical path."""
    N = uv_arr.shape[0]
    if (cfg.filter != TextureFilterMode.Linear
            or getattr(cfg, "disable_level_line", False)
            or subdiv < 2):
        return np.zeros(N, bool)
    ok = ~geom.is_degenerate(uv_arr)
    # stage C normalizes survivor corners with the MACRO winding; thin
    # slivers whose per-micro-triangle fp32 winding could disagree with
    # it (the oracle's op order, engine.resample_fine_item) must take an
    # oracle-order path instead (geom.winding_stable derivation)
    ok &= geom.winding_stable(uv_arr, subdiv)
    if cfg.addr_mode == TextureAddressMode.Border:
        # rare mode with an exact per-µtri seed-footprint check: keep the
        # scalar path, but only for the non-degenerate candidates
        for k in np.flatnonzero(ok):
            ok[k] = _fast_path_ok(texture, cfg, uv_arr[k], subdiv, lg)
        return ok
    for mip in range(texture.mip_count):
        Hbs, Wbs = _span_windows(texture, uv_arr, subdiv, mip)
        Hgs, Wgs = _span_windows(texture, uv_arr, lg, mip)
        He, We = Hbs + 2, Wbs + 2
        win_mx = np.maximum(He, We)
        pad = TILE + win_mx  # per-item TSA
        ok &= win_mx <= TILE
        ok &= np.maximum(Hgs, Wgs) + 6 < pad
        w, h = texture.size(mip)
        q = uv_arr.astype(np.float64) * np.array([w, h], np.float64)
        tmin = np.floor(q.min(axis=1)) - 2
        tmax = np.ceil(q.max(axis=1)) + 2
        if _period_for(texture, cfg.addr_mode, mip) is not None:
            # Periodic modes need no containment: the period plane +
            # modular anchors handle any UV repeat.  Guards: int32 window
            # origins, and non-pow2 Wrap's negative-coordinate uint32-cast
            # quirk (texture.h:42) is aperiodic — keep negative footprints
            # on the exact slow path there.
            ok &= (np.abs(q) < 2.0 ** 30).all(axis=(1, 2))
            if (cfg.addr_mode == TextureAddressMode.Wrap
                    and not texture.info[mip].is_pow2):
                ok &= (tmin[:, 0] >= 1) & (tmin[:, 1] >= 1)
        else:
            ok &= (tmin[:, 0] >= 1 - pad) & (tmin[:, 1] >= 1 - pad)
            ok &= tmax[:, 0] + np.maximum(We + 2, Wgs + 6) <= w + pad
            ok &= tmax[:, 1] + np.maximum(He + 2, Hgs + 6) <= h + pad
    return ok


#: Scan-order compaction via ONE stable sort instead of cumsum+scatter:
#: on v5e a (s32, s32) lax.sort at 393k lanes is ~0.4 ms while the
#: equivalent K_cap scatter is ~1.8 ms (chip trace, round 4).  Process-
#: level kill switch for A/B runs; both paths are bit-identical (stable
#: sort preserves scan order; lanes beyond the valid count hold arbitrary
#: in-range node ids that every consumer masks by Ci/K).
_SORT_COMPACT = os.environ.get("OMM_TP_SORT_COMPACT", "1") != "0"
#: Skip the FINAL level's window test when it is a step-1 expansion
#: (levels[-1] - levels[-2] == 1): children of an unresolved step-1
#: parent share most of its window, so the test resolves only ~18% of
#: its candidates (measured, driver workload) yet costs the single
#: biggest class-plane gather (K_cap lookups) plus a K_cap compact
#: sort.  All children go straight to the exact kernel instead; results
#: are bit-identical (the window resolve and the exact kernel agree on
#: one-sided windows by the conservative-classification contract), and
#: the +K survivors stay inside the same static cap buckets on
#: contour-shaped workloads.  All-active batches only (the replay's
#: finals stream maps 1:1 to children then).
_SKIP_FINAL = os.environ.get("OMM_TP_SKIP_FINAL", "1") != "0"


def _skip_final_p(levels, all_active: bool) -> bool:
    """True when the final-level window test is skipped (shared device/
    host-replay predicate — both sides MUST agree on the payload
    layout)."""
    return (_SKIP_FINAL and bool(all_active) and len(levels) >= 2
            and levels[-1] - levels[-2] == 1)
# class-plane lookups as one linear gather (A/B: 2-D XLA gathers were
# 2.1+1.4 ms/sub-batch at levels 9/8 — 18 ns/elem vs the ~8 ns/elem
# marginal gather floor)
_FLAT_GATHER = os.environ.get("OMM_TP_FLAT_GATHER", "0") == "1"


def _compact_sort(mask, payload, cap):
    """Compact payload[mask] to `cap` lanes in scan order with one stable
    sort (key: ~mask).  Returns (compacted, count).  Lanes >= count are
    arbitrary in-range payload values — consumers must mask."""
    n = payload.shape[0]
    cnt = jnp.sum(mask.astype(jnp.int32))
    key = jnp.where(mask, jnp.int32(0), jnp.int32(1))
    _, srt = jax.lax.sort((key, payload), num_keys=1, is_stable=True)
    if cap <= n:
        out = jax.lax.slice(srt, (0,), (cap,))
    else:
        out = jnp.concatenate([srt, jnp.zeros((cap - n,), payload.dtype)])
    return out, cnt


@partial(jax.jit, static_argnames=("subdiv", "levels", "caps", "K_cap",
                                   "mips", "pads", "ntxs", "all_active",
                                   "periods"))
def _stageAB(cls_levels, uv_flat, active, fz, *, subdiv, levels, caps,
             K_cap, mips, pads, ntxs, all_active, periods=None):
    """Hierarchical descent over `levels` (l0 < ... < subdiv): level 0 is
    a dense (T, 4^l0) window resolve; each later level expands the
    previous level's unresolved nodes (compacted to caps[i-1]) into their
    4^(l_i - l_{i-1}) children and window-tests them; the final level's
    unresolved (& active) micro-triangles are the exact-kernel survivors.

    cls_levels: per-level tuples of per-mip class planes.
    Returns (sides, nodes, ids, kvalid, meta, slots)
    with sides a tuple of flat int8 side arrays, one per level, and meta
    [C_1..C_m, K, flag, per-mip padded slot totals]."""
    T = uv_flat.shape[0]
    M = get_num_micro_triangles(subdiv)
    m = len(levels) - 1
    N0 = 4 ** levels[0]
    span0 = M // N0

    # ---- level 0: dense grid resolve ----
    # (jax.named_scope = the dispatch chain's BeginLabel/EndLabel analog,
    # omm.h:653-661 — stage names appear in jax.profiler traces)
    # Nodes are carried as ONE flat id t*4^l + n: child expansion is
    # exactly flat*E + j, so each level's compaction is a single scatter
    # instead of a (node_t, node_n) pair (~0.9 ms each at 64k+).
    with jax.named_scope("omm.group_resolve"):
        node = jnp.arange(T * N0, dtype=jnp.int32)  # == t*N0 + n
        side0 = _sides_for((node & (N0 - 1)).astype(jnp.uint32),
                           node >> (2 * levels[0]), levels[0],
                           uv_flat, cls_levels[0], mips, pads,
                           periods=periods)
    sides = [side0]

    # a node is skippable entirely when none of its members are active
    if all_active:
        unres = side0 == 0
    else:
        gactive = active.reshape(T, N0, span0).any(axis=2).reshape(-1)
        unres = (side0 == 0) & gactive

    flag = jnp.int32(0)
    metas = []
    nodes = []
    cvalid = surv = None
    for i in range(1, m + 1):
        li = levels[i]
        E = 4 ** (li - levels[i - 1])
        cap = caps[i - 1]
        # compact unresolved parents (scan order — the host reconstruction
        # replays the identical compaction from the fetched sides)
        if _SORT_COMPACT:
            par, Ci = _compact_sort(unres, node, cap)
        else:
            pos = jnp.cumsum(unres.astype(jnp.int32)) - 1
            Ci = (pos[-1] + 1).astype(jnp.int32)
            tgt = jnp.where(unres & (pos < cap), pos, cap)
            par = jnp.zeros((cap,), jnp.int32).at[tgt].set(node,
                                                           mode="drop")
        pvalid = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(Ci, cap)
        flag = jnp.maximum(flag, jnp.where(Ci > cap, jnp.int32(1),
                                           jnp.int32(0)))
        metas.append(Ci)
        # expand E children per parent: flat' = flat*E + j
        jj = jnp.arange(E, dtype=jnp.int32)
        node = jnp.repeat(par * E, E) + jnp.tile(jj, cap)
        valid = jnp.repeat(pvalid, E)
        if i == m and _skip_final_p(levels, all_active):
            # step-1 tail: no window test, no survivor compaction — the
            # expanded children (a prefix, since `par` is compacted) ARE
            # the exact-kernel survivors, already in scan order
            K = jnp.minimum(Ci, jnp.int32(cap)) * E
            if cap * E >= K_cap:
                ids = jax.lax.slice(node, (0,), (K_cap,))
            else:
                ids = jnp.concatenate(
                    [node, jnp.zeros((K_cap - cap * E,), jnp.int32)])
            kvalid = jnp.arange(K_cap, dtype=jnp.int32) < jnp.minimum(
                K, jnp.int32(K_cap))
            flag = jnp.maximum(flag, jnp.where(
                Ci * E > K_cap, jnp.int32(1), jnp.int32(0)))
            cvalid = valid
            break
        with jax.named_scope(f"omm.resolve_l{li}"):
            side_i = _sides_for((node & (4 ** li - 1)).astype(jnp.uint32),
                                node >> (2 * li), li,
                                uv_flat, cls_levels[i], mips, pads,
                                periods=periods)
        sides.append(side_i)
        nodes.append((node, valid))
        if i < m:
            unres = valid & (side_i == 0)
        else:
            cvalid = valid
            if all_active:
                surv = valid & (side_i == 0)
            else:
                surv = (valid
                        & active[node >> (2 * subdiv),
                                 jnp.minimum(node & (M - 1), M - 1)]
                        & (side_i == 0))

    if not _skip_final_p(levels, all_active):
        # compact survivors to K_cap (the final-level flat id IS t*M + m)
        if _SORT_COMPACT:
            ids, K = _compact_sort(surv, node, K_cap)
        else:
            poss = jnp.cumsum(surv.astype(jnp.int32)) - 1
            K = (poss[-1] + 1).astype(jnp.int32)
            tgt_s = jnp.where(surv & (poss < K_cap), poss, K_cap)
            ids = jnp.zeros((K_cap,), jnp.int32).at[tgt_s].set(node,
                                                               mode="drop")
        kvalid = jnp.arange(K_cap, dtype=jnp.int32) < jnp.minimum(K, K_cap)
        flag = jnp.maximum(flag, jnp.where(K > K_cap, jnp.int32(1),
                                           jnp.int32(0)))

    # ---- per-mip tile sort + group padding -> slot assignment ----
    # (labeled for jax.profiler like the reference's per-pass markers)
    sv_t = (ids // M).astype(jnp.int32)
    sv_m = (ids % M).astype(jnp.uint32)
    bu, bv, bd = _bary_cols(sv_m, subdiv)
    tri6 = _tri6_of(uv_flat, sv_t)
    slots = []
    metas = metas + [K, flag]
    for mi, (w, h) in enumerate(mips):
        pad = pads[mi]
        ntx = ntxs[mi]
        x0, y0 = _window_origin(tri6, bu, bv, bd, w, h, fz)
        x0, y0 = _wrap_origin(x0, y0, periods[mi] if periods else None)
        tile = ((y0 + pad) // TILE) * ntx + (x0 + pad) // TILE
        tile = jnp.where(kvalid, tile, _INVALID_TILE)
        # One sort co-sorts the permutation payload (argsort + a follow-up
        # K_cap gather profiled ~1.4 ms each at 196k); group offsets come
        # from an elementwise scan over the SORTED stream instead of
        # segment_sum + an offsets[gid] gather: at each group start the
        # previous group closes, contributing its B-padded extent.
        ar = jnp.arange(K_cap, dtype=jnp.int32)
        st, order = jax.lax.sort((tile, ar), num_keys=1, is_stable=True)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), st[1:] != st[:-1]])
        start_pos = jax.lax.cummax(jnp.where(is_start, ar, 0))
        rank = ar - start_pos
        start_prev = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), start_pos[:-1]])
        prev_size = ar - start_prev      # at starts: extent of the closed group
        inc = jnp.where(is_start & (ar > 0),
                        ((prev_size + B - 1) // B) * B, 0)
        offsets_elem = jnp.cumsum(inc).astype(jnp.int32)
        valid_el = st != _INVALID_TILE
        slot_sorted = jnp.where(valid_el, offsets_elem + rank, _SENTINEL)
        if _SORT_COMPACT:
            # invert the tile permutation with a second sort (order is a
            # permutation of 0..K_cap-1, so sorting by it un-permutes)
            _, slot = jax.lax.sort((order, slot_sorted), num_keys=1)
        else:
            slot = (jnp.zeros((K_cap,), jnp.int32)
                    .at[order].set(slot_sorted))
        # total padded slot count: each valid element bounds it by its
        # group's offset plus its own B-rounded rank; the max is exact at
        # the last valid element
        padM_m = jnp.max(jnp.where(
            valid_el, offsets_elem + ((rank + B) // B) * B, 0))
        metas.append(padM_m.astype(jnp.int32))
        slots.append((slot, tile))

    meta = jnp.stack(metas)
    return (tuple(sides), tuple(nodes), ids, kvalid, meta, tuple(slots))


# ---------------------------------------------------------------------------
# stage C (per mip): slot stream -> Pallas kernel -> survivor counts
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("subdiv", "K_cap", "nblk", "w", "h",
                                   "pad", "ntx", "H", "W", "rcp",
                                   "alpha_cutoff", "period", "exact",
                                   "bf16x3"))
def _stageC_mip(tilesE, uv_flat, ccw, ids, kvalid, slot, tile, fz, *, subdiv,
                K_cap, nblk, w, h, pad, ntx, H, W, rcp, alpha_cutoff,
                period=None, exact="pallas", bf16x3=False):
    """Build the (nblk, 1, B) slot id stream on device and run the exact
    kernel (which derives each slot's geometry in-kernel from the
    id + the tiny per-item UV table); returns (above, below) int32
    (K_cap,) in survivor order.  exact: "pallas" = the Mosaic kernel
    (default engine), "xla" = the same kernel body through pure XLA
    (`pk._run_v3_xla`, the ComputeOnly engine / Mosaic-free fallback)."""
    padM = nblk * B
    ok = kvalid & (slot < padM)
    tgt = jnp.where(ok, slot, padM)  # OOB drops

    ids_slot = (jnp.full((padM,), -1, jnp.int32)
                .at[tgt].set(ids, mode="drop")
                .reshape(nblk, 1, B))
    uv6T = uv_flat.T.astype(jnp.float32)          # (6, T)
    ccw1T = ccw.astype(jnp.float32).reshape(1, -1)  # (1, T)

    # Tile groups are B-aligned (padded = ceil(sizes/B)*B in _stageAB),
    # so every non-empty block's FIRST slot holds a real survivor:
    # recompute that survivor's tile key from its id (same _window_origin
    # fp32 ops, guard-fenced, as the slot sort used) — nblk elements of
    # bird math instead of a K_cap-update scatter-max (~1.6 ms at 196k).
    first_ids = ids_slot[:, 0, 0]
    M = get_num_micro_triangles(subdiv)
    fb_t = (jnp.maximum(first_ids, 0) // M).astype(jnp.int32)
    fb_m = (jnp.maximum(first_ids, 0) % M).astype(jnp.uint32)
    fbu, fbv, fbd = _bary_cols(fb_m, subdiv)
    ftri6 = _tri6_of(uv_flat, fb_t)
    fx0, fy0 = _window_origin(ftri6, fbu, fbv, fbd, w, h, fz)
    fx0, fy0 = _wrap_origin(fx0, fy0, period)
    block_tile = jnp.where(
        first_ids >= 0,
        ((fy0 + pad) // TILE) * ntx + (fx0 + pad) // TILE, 0)

    # The XLA engine always takes the runtime fence token: its body runs
    # through XLA (which may contract fp32 mul+add); Mosaic's codegen is
    # verified non-contracting so the Pallas engine skips it on chips.
    run = pk._run_v3 if exact == "pallas" else pk._run_v3_xla
    a_b, b_b = run(
        tilesE, block_tile, ids_slot, uv6T, ccw1T,
        fz.reshape(1, 1) if (exact != "pallas" or pk.kernel_fence())
        else None,
        H=H, W=W, He=H + 2, We=W + 2, TSA=TILE + max(H + 2, W + 2),
        size=(w, h), rcp=rcp, alpha_cutoff=alpha_cutoff, nblk=nblk,
        subdiv=subdiv, pad=pad, ntx=ntx, period=period, bf16x3=bf16x3)
    # One packed slot->survivor permutation gather instead of two: counts
    # are bounded by the fast-path window (H, W <= TILE-2 texels, <= 8
    # increments per texel + 1 seed), so (a << 16) | b is lossless and
    # sign-safe iff 8*(TILE-2)^2 + 1 <= 32767 — i.e. TILE <= 65.  The
    # guard turns a silent count corruption under an OMM_PALLAS_TILE
    # override into a loud configuration error.  The XLA gather is
    # latency-bound per element (~7 ns/elem at K_cap=196k), so halving
    # the element count halves the readback cost.
    assert 8 * (TILE - 2) ** 2 + 1 <= 0x7FFF, (
        f"OMM_PALLAS_TILE={TILE} breaks the (above<<16)|below packing "
        "(needs TILE <= 65)")
    ab = (a_b.reshape(-1) << 16) | b_b.reshape(-1)
    safe = jnp.minimum(tgt, padM - 1)
    abg = jnp.where(ok, ab[safe], 0)
    return abg >> 16, abg & jnp.int32(0xFFFF)


# ---------------------------------------------------------------------------
# stage D: accumulate mips, merge all levels, pack 2-bit states
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("subdiv", "levels", "fmt", "promotion",
                                   "cutoff_gt", "cutoff_le"))
def _stageD(sides, nodes, ids, kvalid, mip_counts,
            *, subdiv, levels, fmt, promotion, cutoff_gt, cutoff_le):
    """Final 2-bit-packed (T, M/4) uint8 states (strided order: byte k of
    item t holds micro-tris {k, k+M/4, k+2M/4, k+3M/4} — see
    _unpack_states).  `sides` is the per-level tuple from _stageAB; each
    level's rows overwrite the coarser base (finer levels refine the
    contour neighborhood)."""
    from .levelline import get_state_from_coverage

    M = get_num_micro_triangles(subdiv)
    m = len(levels) - 1
    N0 = 4 ** levels[0]
    T = sides[0].shape[0] // N0
    K_cap = ids.shape[0]

    above = jnp.zeros((K_cap,), jnp.int32)
    below = jnp.zeros((K_cap,), jnp.int32)
    alive = jnp.ones((K_cap,), bool)
    for a, b in mip_counts:
        above = above + jnp.where(alive, a, 0)
        below = below + jnp.where(alive, b, 0)
        st = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                     cutoff_le, above, below)
        alive = alive & ~((st == UO) | (st == UT))
    final = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                    cutoff_le, above, below)

    st_gt = jnp.int8(int(cutoff_gt))
    st_le = jnp.int8(int(cutoff_le))

    def map_side(s):
        return jnp.where(s == 1, st_gt, jnp.where(s == -1, st_le,
                                                  jnp.int8(0)))

    # level-0 base; later levels overwrite whole node rows (their parent
    # side is 0, and inactive/survivor members are refined below or
    # ignored by the host writeback).  When the final level's window
    # test is skipped (_skip_final_p), `sides` has no final-level entry:
    # every final-level candidate is an exact-kernel survivor and the
    # ids scatter below covers them all.
    base = jnp.broadcast_to(map_side(sides[0]).reshape(T * N0, 1),
                            (T * N0, M // N0)).reshape(T * M)
    for i in range(1, len(sides)):
        li = levels[i]
        node, valid = nodes[i - 1]
        span = M // (4 ** li)
        Nl = T * (4 ** li)
        rows = jnp.broadcast_to(map_side(sides[i])[:, None],
                                (sides[i].shape[0], span))
        row_tgt = jnp.where(valid, node, Nl)
        base = base.reshape(Nl, span).at[row_tgt].set(
            rows, mode="drop").reshape(T * M)
    # exact-kernel survivors
    stgt = jnp.where(kvalid, ids, T * M)
    base = base.at[stgt].set(final.astype(jnp.int8), mode="drop")

    # strided 2-bit pack: no relayout (all ops on (T, M//4) slices)
    states = base.reshape(T, 4, M // 4).astype(jnp.uint8)
    packed = (states[:, 0] | (states[:, 1] << 2) | (states[:, 2] << 4)
              | (states[:, 3] << 6))
    return packed


def _pack2_seq(v):
    """(4n,) uint8 values in 0..3 -> (n,) uint8, sequential 2-bit pack."""
    r = v.reshape(-1, 4)
    return (r[:, 0] | (r[:, 1] << 2) | (r[:, 2] << 4)
            | (r[:, 3] << 6)).astype(jnp.uint8)


def _unpack2_seq(b: np.ndarray) -> np.ndarray:
    """(n,) uint8 -> (4n,) uint8; host inverse of _pack2_seq."""
    out = np.empty(b.shape[0] * 4, np.uint8)
    out[0::4] = b & 3
    out[1::4] = (b >> 2) & 3
    out[2::4] = (b >> 4) & 3
    out[3::4] = (b >> 6) & 3
    return out


@partial(jax.jit, static_argnames=("fmt", "promotion",
                                   "cutoff_gt", "cutoff_le", "nblk_caps"))
def _stageD_spec(sides, mip_counts, meta, *, fmt, promotion,
                 cutoff_gt, cutoff_le, nblk_caps):
    """Speculative-mode stage D, compressed-fetch variant: ONE uint8
    vector [meta int32s | per-level sides 2-bit | survivor-final 2-bit]
    — far smaller than the full per-micro-tri pack, sized so the
    host->device link (the pipeline's bottleneck on a tunnel-attached
    chip) carries only the phase-1 side classes plus exact survivor
    states.  The host reconstructs the full state array by replaying the
    same deterministic scan-order descent the device used
    (finish_compact).  flag != 0 (capacity overflow) sends the batch to
    the synchronous path; the payload content is then never consumed."""
    from .levelline import get_state_from_coverage

    K_cap = mip_counts[0][0].shape[0]
    above = jnp.zeros((K_cap,), jnp.int32)
    below = jnp.zeros((K_cap,), jnp.int32)
    alive = jnp.ones((K_cap,), bool)
    for a, b in mip_counts:
        above = above + jnp.where(alive, a, 0)
        below = below + jnp.where(alive, b, 0)
        st = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                     cutoff_le, above, below)
        alive = alive & ~((st == UO) | (st == UT))
    final = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                    cutoff_le, above, below)

    # meta layout is [C_1..C_m, K, flag, per-mip padM]: m comes from the
    # meta length, NOT len(sides) — a skipped final level (_skip_final_p)
    # ships one fewer side stream but the same meta
    m = meta.shape[0] - 2 - len(nblk_caps)
    flag = meta[m + 1]
    for mi, cap in enumerate(nblk_caps):
        flag = jnp.maximum(flag, jnp.where(meta[m + 2 + mi] > cap * B,
                                           jnp.int32(1), jnp.int32(0)))
    mv = jnp.concatenate([meta[:m + 1], flag[None],
                          meta[m + 2:]]).astype(jnp.int32)
    mrow = jax.lax.bitcast_convert_type(mv, jnp.uint8).reshape(-1)
    return jnp.concatenate(
        [mrow]
        + [_pack2_seq((s + 1).astype(jnp.uint8).reshape(-1))
           for s in sides]
        + [_pack2_seq(final.astype(jnp.uint8))])


def _unpack_states(packed: np.ndarray, M: int) -> np.ndarray:
    """(M/4,) uint8 -> (M,) uint8; inverse of _stageD's strided pack
    (native C++ fast path with numpy fallback)."""
    from .. import native
    return native.unpack_2bit_strided(packed, M)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _group_level(texture: Texture, uv_tris, subdiv: int) -> int:
    """Subdivision level of the resolve groups: subtriangle texel span
    ~8-16 at mip 0."""
    w, h = texture.size(0)
    span = 1.0
    if uv_tris:
        q = np.stack(uv_tris).astype(np.float64) \
            * np.array([w, h], np.float64)
        span = max(span, float((q.max(axis=1) - q.min(axis=1)).max()))
    lg = int(np.ceil(np.log2(max(span / 8.0, 1.0))))
    return max(1, min(subdiv - 1, lg))


def _descend_levels(texture: Texture, uv_tris, subdiv: int,
                    lg: int) -> tuple:
    """Hierarchical descent schedule (l0, ..., subdiv): start at the
    COARSEST level whose window class plane still fits the tile padding,
    then step down by 2 (16 children per unresolved node).  Total window
    lookups shrink ~3x vs the flat two-level scheme: each level prunes
    the interior, so only the alpha-contour neighborhood expands."""
    l0 = lg
    uv_arr = np.stack(uv_tris) if uv_tris else np.zeros((0, 3, 2))
    pads_sub = []
    for mip in range(texture.mip_count):
        Hb, Wb = _span_windows(texture, uv_arr, subdiv, mip)
        pads_sub.append(TILE + np.maximum(Hb + 2, Wb + 2))
    for lv in range(1, lg):
        ok = True
        for mip in range(texture.mip_count):
            Hg, Wg = _span_windows(texture, uv_arr, lv, mip)
            if (np.maximum(Hg, Wg) + 6 >= pads_sub[mip]).any():
                ok = False
                break
        if ok:
            l0 = lv
            break
    levels = list(range(l0, subdiv, 2))
    # Optional step-1 tail (A/B knob): insert subdiv-1 so the finest
    # level expands 4 children per parent instead of 16 — if unresolved
    # counts roughly double per level, final-level window lookups drop
    # ~2x for one extra (cheap) gather+compact round.
    if (os.environ.get("OMM_TP_TAIL_STEP1", "0") == "1"
            and levels and levels[-1] != subdiv - 1 and subdiv - 1 > l0):
        levels.append(subdiv - 1)
    levels.append(subdiv)
    return tuple(levels)


def _fast_path_ok(texture: Texture, cfg, uv_tri: np.ndarray,
                  subdiv: int, lg: int) -> bool:
    if (cfg.filter != TextureFilterMode.Linear
            or getattr(cfg, "disable_level_line", False)
            or subdiv < 2
            or bool(geom.is_degenerate(uv_tri))):
        return False
    if cfg.addr_mode == TextureAddressMode.Border:
        # Border seed quirk (texture.Texture.bilinear): the oracle clamps
        # the sentinel instead of applying borderAlpha, while the padded
        # plane substitutes borderAlpha.  Admit only items whose every
        # micro-triangle seed 2x2 bilinear footprint is in-bounds — checked
        # exactly, with the oracle's own fp32 op order (p0 * sizef - 0.5).
        # Per-texel kernel gathers may still reach border texels (cells can
        # extend one texel past the outermost seed): those reads come from
        # the borderAlpha-filled padding, matching the reference kernels.
        M = get_num_micro_triangles(subdiv)
        p0 = bird.micro_triangle_uvs(
            uv_tri, np.arange(M, dtype=np.uint32), subdiv)[:, 0, :]
        for mip in range(texture.mip_count):
            w, h = texture.size(mip)
            s = np.floor(p0 * np.array([w, h], np.float32)
                         - np.float32(0.5))
            if (s < 0).any() or (s[:, 0] > w - 2).any() \
                    or (s[:, 1] > h - 2).any():
                return False
    for mip in range(texture.mip_count):
        Hb, Wb = _span_window(texture, uv_tri, subdiv, mip)
        Hg, Wg = _span_window(texture, uv_tri, lg, mip)
        He, We = Hb + 2, Wb + 2
        if max(He, We) > TILE:  # window larger than a tile: not this engine
            return False
        TSA = TILE + max(He, We)
        pad = TSA
        if max(Hg, Wg) + 6 >= pad:  # group window must fit the padding
            return False
        w, h = texture.size(mip)
        q = uv_tri.astype(np.float64) * np.array([w, h], np.float64)
        tmin = np.floor(q.min(axis=0)) - 2
        tmax = np.ceil(q.max(axis=0)) + 2
        if _period_for(texture, cfg.addr_mode, mip) is not None:
            # see _fast_path_mask: periodic modes skip containment
            if (np.abs(q) >= 2.0 ** 30).any():
                return False
            if (cfg.addr_mode == TextureAddressMode.Wrap
                    and not texture.info[mip].is_pow2
                    and (tmin[0] < 1 or tmin[1] < 1)):
                return False
        elif (tmin[0] < 1 - pad or tmin[1] < 1 - pad
                or tmax[0] + max(We + 2, Wg + 6) > w + pad
                or tmax[1] + max(He + 2, Hg + 6) > h + pad):
            return False
    return True


class PackedStates:
    """A classified item's states in serialize's sequential 2-bit
    OC1_4_State layout (state j in byte j>>2 at shift (j&3)*2) — the
    packed-direct replay's output form.  The bake memcpys `packed`
    straight into the result blob; WorkItem.states materializes the
    (M,) uint8 array lazily for consumers that need bytes (LSH, merge,
    stats, debug)."""

    __slots__ = ("packed", "M", "blob_offset")

    def __init__(self, packed: np.ndarray, M: int, blob_offset=None):
        self.packed = packed
        self.M = M
        # byte offset in the speculative result blob when the replay
        # wrote this row in place (serialize skips the copy after
        # validating the speculative layout); None otherwise
        self.blob_offset = blob_offset

    def unpack(self) -> np.ndarray:
        from .. import native
        return native.unpack_2bit_seq(self.packed, self.M)


class _BatchCtx:
    """Host-side preparation of one fast-path batch (no device work)."""

    @property
    def active(self):
        a = getattr(self, "_active_cache", None)
        if a is None:
            a = np.stack([np.ones(self.M, bool) if self.items[i][1] is None
                          else self.items[i][1] == UO for i in self.fast])
            self._active_cache = a
        return a

    def __init__(self, texture, cfg, items, subdiv, fast, out,
                 all_active=None, precomp=None, want_post=True,
                 want_packed=False, sink=None, exact="pallas"):
        self.texture = texture
        self.cfg = cfg
        # exact-stage engine: "pallas" (Mosaic kernel, default) or "xla"
        # (same kernel body through pure XLA — the ComputeOnly engine)
        self.exact = exact
        self.items = items
        self.subdiv = subdiv
        self.fast = fast
        self.out = out
        self.post = {}  # item idx -> (states3 digest, uniform value)
        # the fused digest/uniform pass re-reads every reconstructed byte
        # (~11 ms per 128-item subdiv-9 batch on a 1-core host); callers
        # that never consume posts (pure classification) skip it
        self.want_post = want_post
        # packed-direct replay: out[i] becomes a PackedStates (the
        # serialize-ready 2-bit rows; ~8x less replay time than the
        # unpacked (T, M) materialization).  All-active batches only.
        self.want_packed = want_packed
        # sink = (blob, dst): speculative-serialize destination — dst[i]
        # is batch item i's byte offset in `blob` (the final result
        # blob, morton-order layout computed before classification) or
        # -1; the replay writes rows in place so serialize never copies
        # them.  Only consulted on the want_packed all-active path.
        self.sink = sink
        self.M = get_num_micro_triangles(subdiv)
        # precomp: the caller's one vectorized pass over ITS WHOLE fast
        # set ({lg, levels, HW, HWl}); window maxima over a superset are
        # still conservative (a larger phase-1 window only sends more
        # nodes to the exact kernel, never changes a resolved state) and
        # give every batch of the call one shared jit signature.
        if precomp is not None:
            self.lg = precomp["lg"]
            self.levels = precomp["levels"]
        else:
            self.lg = _group_level(texture,
                                   [items[i][0] for i in fast], subdiv)
            self.levels = _descend_levels(
                texture, [items[i][0] for i in fast], subdiv, self.lg)
        self.T = len(fast)
        uv_arr = np.stack([items[i][0] for i in fast])
        self.uv_flat = uv_arr.reshape(self.T, 6).astype(np.float32)
        self.ccw = geom.is_ccw(uv_arr)
        # avoid materializing the (T, M) mask in the common all-active
        # case (fresh bakes); states are in {0..3} so min()==UO(3) is
        # exactly "all UnknownOpaque", with no 4^subdiv-byte temporaries
        # (profiled at ~9 ms/batch as (st == UO).all()).  Callers that
        # already scanned the states pass the answer in.  states=None is
        # the declared fresh-bake form: all UnknownOpaque, no scan.
        if all_active is None:
            all_active = all(items[i][1] is None
                             or int(items[i][1].min()) == UO for i in fast)
        self.all_active = all_active

        cutoff = float(cfg.alpha_cutoff)
        self.mips, self.pads, self.HWu, self.ntxs = [], [], [], []
        self.tilesEs, self.rcps = [], []
        self.periods = []
        self.bf16oks = []  # per mip: bf16x3 split admitted AND wanted
        self.cls_lv = [[] for _ in self.levels]
        for mip in range(texture.mip_count):
            if precomp is not None:
                Hb, Wb = precomp["HW"][mip]
            else:
                Hbs, Wbs = _span_windows(texture, uv_arr, subdiv, mip)
                Hb, Wb = int(Hbs.max()), int(Wbs.max())
            TSA = TILE + max(Hb + 2, Wb + 2)
            pad = TSA
            ba = float(getattr(cfg, "border_alpha", 0.0))
            period = _period_for(texture, cfg.addr_mode, mip)
            self.periods.append(period)
            _, tilesE, nty, ntx, bf16ok = _planes_cached(
                texture, mip, cfg.addr_mode, pad, TSA, ba, period)
            self.bf16oks.append(bf16ok
                                and pk.bf16x3_policy(self.exact))
            self.mips.append(texture.size(mip))
            self.pads.append(pad)
            self.HWu.append((Hb, Wb))
            self.ntxs.append(ntx)
            for li, lv in enumerate(self.levels):
                if precomp is not None:
                    Hl, Wl = precomp["HWl"][li][mip]
                else:
                    Hls, Wls = _span_windows(texture, uv_arr, lv, mip)
                    Hl, Wl = int(Hls.max()), int(Wls.max())
                self.cls_lv[li].append(
                    _cls_cached(texture, mip, cfg.addr_mode, pad, TSA,
                                Hl, Wl, cutoff,
                                PHASE1_MARGIN, ba, period))
            self.tilesEs.append(tilesE)
            info = texture.info[mip]
            self.rcps.append((float(info.rcp_size[0]),
                              float(info.rcp_size[1])))

        # device uploads are lazy (properties below): ctx construction is
        # then pure host work, so it can pipeline with an enqueue thread
        # that owns ALL device-stream operations (H2D + dispatch order)
        self._uvJ = self._ccwJ = self._actJ = None
        caps = getattr(texture, "_omm_caps", {})
        texture._omm_caps = caps
        self.caps = caps
        self.cap_key = (subdiv, self.levels, self.T, self.all_active)

    @property
    def uvJ(self):
        if self._uvJ is None:
            self._uvJ = jnp.asarray(self.uv_flat)
        return self._uvJ

    @property
    def uv7J(self):
        """UV columns + winding in ONE device array (T, 7): the
        speculative chain's only per-batch upload — each separate H2D
        pays a tunnel round trip."""
        u = getattr(self, "_uv7J", None)
        if u is None:
            u = self._uv7J = jnp.asarray(np.concatenate(
                [self.uv_flat,
                 self.ccw.astype(np.float32)[:, None]], axis=1))
        return u

    @property
    def ccwJ(self):
        if self._ccwJ is None:
            self._ccwJ = jnp.asarray(self.ccw)
        return self._ccwJ

    @property
    def actJ(self):
        if self._actJ is None:
            self._actJ = _act_all() if self.all_active \
                else jnp.asarray(self.active)
        return self._actJ

    @property
    def cls_tuple(self):
        return tuple(tuple(per_mip) for per_mip in self.cls_lv)

    def stage_ab(self, Cs, K_cap):
        return _stageAB(self.cls_tuple, self.uvJ,
                        self.actJ, _fz0(),
                        subdiv=self.subdiv, levels=self.levels,
                        caps=tuple(Cs), K_cap=K_cap,
                        mips=tuple(self.mips), pads=tuple(self.pads),
                        ntxs=tuple(self.ntxs), all_active=self.all_active,
                        periods=tuple(self.periods))

    def stage_c(self, mip, res, K_cap, nblk):
        (sides, nodes, ids, kvalid, meta, slots) = res
        w, h = self.mips[mip]
        return _stageC_mip(
            self.tilesEs[mip], self.uvJ, self.ccwJ, ids, kvalid,
            slots[mip][0], slots[mip][1], _fz0(),
            subdiv=self.subdiv, K_cap=K_cap,
            nblk=nblk, w=w, h=h, pad=self.pads[mip], ntx=self.ntxs[mip],
            H=self.HWu[mip][0], W=self.HWu[mip][1], rcp=self.rcps[mip],
            alpha_cutoff=float(self.cfg.alpha_cutoff),
            period=self.periods[mip], exact=self.exact,
            bf16x3=self.bf16oks[mip])

    def finish(self, packed):
        for t, i in enumerate(self.fast):
            states = self.items[i][1]
            unp = _unpack_states(packed[t], self.M)
            if self.all_active or states is None:
                self.out[i] = unp
            else:
                act = self.active[t]
                st = states.copy()
                st[act] = unp[act]
                self.out[i] = st

    def finish_compact(self, buf: np.ndarray, Cs_cap, K_cap: int,
                       Cs, K: int):
        """Reconstruct full per-item states from the compressed payload
        (meta | per-level sides | finals) and write them back: replay
        _stageAB's deterministic scan-order descent, overwriting each
        level's node rows, then scatter the exact survivor finals."""
        T, M = self.T, self.M
        levels = self.levels
        m = len(levels) - 1
        N0 = 4 ** levels[0]
        hdr = 4 * (m + 2 + len(self.mips))
        skip = _skip_final_p(levels, self.all_active)

        from .. import native
        if self.want_packed and self.all_active:
            if self.sink is not None and self.subdiv >= 1:
                blob, dst = self.sink
                rb = np.asarray([dst[i] for i in self.fast], np.int64)
                if rb.size and (rb >= 0).all() and native.reconstruct_packed(
                        buf, hdr, levels, T, self.subdiv, Cs, Cs_cap, K,
                        K_cap, int(self.cfg.cutoff_gt),
                        int(self.cfg.cutoff_le), row_base=rb, out=blob,
                        skip_final=skip):
                    Q = M >> 2
                    post = (native.row_post_packed(blob, M, row_base=rb)
                            if self.want_post else None)
                    self.post = {}
                    for t, i in enumerate(self.fast):
                        o = int(rb[t])
                        self.out[i] = PackedStates(blob[o:o + Q], M,
                                                   blob_offset=o)
                        if post is not None:
                            self.post[i] = (int(post[0][t]),
                                            int(post[1][t]))
                    return
            pk = native.reconstruct_packed(
                buf, hdr, levels, T, self.subdiv, Cs, Cs_cap, K, K_cap,
                int(self.cfg.cutoff_gt), int(self.cfg.cutoff_le),
                skip_final=skip)
            if pk is not None:
                post = (native.row_post_packed(pk, M)
                        if self.want_post else None)
                self.post = {}
                for t, i in enumerate(self.fast):
                    self.out[i] = PackedStates(pk[t], M)
                    if post is not None:
                        self.post[i] = (int(post[0][t]), int(post[1][t]))
                return
        rec = native.reconstruct_states(
            buf, hdr, levels, T, self.subdiv, Cs, Cs_cap, K, K_cap,
            int(self.cfg.cutoff_gt), int(self.cfg.cutoff_le),
            None if self.all_active else self.active, skip_final=skip)
        if rec is not None:
            # fused post pass while rec is cache-warm: per-row exact-dedup
            # digest + uniform value for rows returned as-is (rows merged
            # into prior states change bytes, so no cached post for them)
            post = native.row_post(rec) if self.want_post else None
            self.post = {}
            for t, i in enumerate(self.fast):
                if self.all_active or self.items[i][1] is None:
                    self.out[i] = rec[t]
                    if post is not None:
                        self.post[i] = (int(post[0][t]), int(post[1][t]))
                else:
                    st = self.items[i][1].copy()
                    act = self.active[t]
                    st[act] = rec[t][act]
                    self.out[i] = st
            return

        sizes = [T * N0] + [
            Cs_cap[i] * 4 ** (levels[i + 1] - levels[i])
            for i in range(m - 1 if skip else m)]
        sides = []
        o = hdr
        for s in sizes:
            sides.append(_unpack2_seq(buf[o:o + s // 4]).astype(np.int8)
                         - 1)
            o += s // 4
        finals = _unpack2_seq(buf[o:o + K_cap // 4])  # (K_cap,)

        st_gt = np.uint8(int(self.cfg.cutoff_gt))
        st_le = np.uint8(int(self.cfg.cutoff_le))

        def map_side(s):
            return np.where(s == 1, st_gt,
                            np.where(s == -1, st_le, np.uint8(0)))

        base = np.repeat(map_side(sides[0]), M // N0)  # (T*M,)

        if self.all_active:
            unres = sides[0] == 0
        else:
            gact = self.active.reshape(T, N0, M // N0).any(
                axis=2).reshape(-1)
            unres = (sides[0] == 0) & gact
        node_t = np.repeat(np.arange(T, dtype=np.int64), N0)
        node_n = np.tile(np.arange(N0, dtype=np.int64), T)
        for i in range(1, m + 1):
            li = levels[i]
            E = 4 ** (li - levels[i - 1])
            Ci = min(int(Cs[i - 1]), Cs_cap[i - 1])
            cand = np.flatnonzero(unres)[:Ci]   # scan order
            Ci = cand.shape[0]
            node_t = np.repeat(node_t[cand], E)
            node_n = (np.repeat(node_n[cand] * E, E)
                      + np.tile(np.arange(E, dtype=np.int64), Ci))
            if skip and i == m:
                break  # no final side stream: every child is a survivor
            side_i = sides[i][:Ci * E]
            span = M // (4 ** li)
            rows = map_side(side_i)
            flat = node_t * (4 ** li) + node_n
            if span == 1:
                base[flat] = rows
            else:
                base.reshape(T * 4 ** li, span)[flat] = rows[:, None]
            if i < m:
                unres = side_i == 0

        # exact-kernel survivors: scan order over the final-level stream
        if skip:
            sids = node_t * M + node_n
        else:
            surv = sides[m][:node_t.shape[0]] == 0
            if not self.all_active:
                surv &= self.active[node_t, node_n]
            sids = (node_t * M + node_n)[surv]
        n = min(int(K), sids.shape[0])
        base[sids[:n]] = finals[:n]

        base = base.reshape(T, M)
        for t, i in enumerate(self.fast):
            if self.all_active or self.items[i][1] is None:
                self.out[i] = base[t]
            else:
                st = self.items[i][1].copy()
                act = self.active[t]
                st[act] = base[t][act]
                self.out[i] = st


def _run_batch_sync(ctx: _BatchCtx):
    """Capacity-discovering two-sync path; updates the caps cache (incl.
    the per-mip slot-block buckets that enable speculative mode)."""
    cfg = ctx.cfg
    levels = ctx.levels
    m = len(levels) - 1
    entry = ctx.caps.get(ctx.cap_key)
    if entry is None:
        # contour scaling: unresolved nodes roughly double per level, and
        # exact-kernel survivors scale with the contour length (~T * 2^L
        # micro-triangles straddle the alpha contour), not with area
        Cs = [max(_bucket(ctx.T * (2 ** levels[i]) * 8), 512)
              for i in range(m)]
        K_cap = max(_bucket(min(ctx.T * (2 ** ctx.subdiv) * 16,
                                ctx.T * ctx.M)), 4 * B)
    else:
        Cs, K_cap = list(entry[0]), entry[1]

    for _attempt in range(4):
        res = ctx.stage_ab(Cs, K_cap)
        meta_np = np.asarray(res[4])  # sync #1
        Cs_true = [int(meta_np[i]) for i in range(m)]
        K, flag = int(meta_np[m]), int(meta_np[m + 1])
        if flag == 0:
            break
        Cs = [max(c, _bucket(ct + ct // 8 + 64))
              for c, ct in zip(Cs, Cs_true)]
        K_cap = max(K_cap, _bucket(K + K // 8 + 64))
    else:
        return None
    (sides, nodes, ids, kvalid, meta, slots) = res

    mip_counts = []
    nblks = []
    nblks_true = []
    for mip in range(len(ctx.mips)):
        padM = int(meta_np[m + 2 + mip])
        nblk_true = (padM + B - 1) // B
        nblks_true.append(nblk_true)
        nblk = max(_bucket(nblk_true), 8)
        nblks.append(nblk)
        if K > 0:
            try:
                mip_counts.append(ctx.stage_c(mip, res, K_cap, nblk))
            except fb.KERNEL_FALLBACK_ERRORS as e:
                # toolchain gap (Mosaic lowering / backend compile):
                # recorded + warned, then the slow path takes the batch
                fb.record("twophase.stage_c", e)
                return None

    packed = np.asarray(_stageD(
        sides, nodes, ids, kvalid,
        tuple(mip_counts), subdiv=ctx.subdiv, levels=levels, fmt=cfg.fmt,
        promotion=cfg.promotion, cutoff_gt=cfg.cutoff_gt,
        cutoff_le=cfg.cutoff_le))  # sync #2

    # remember observed sizes (with headroom) so later batches run the
    # single-sync speculative pipeline.  Margins apply to the TRUE
    # observed counts, bucketed once (an earlier version re-bucketed the
    # already-bucketed nblk, inflating the Pallas grid by up to 77%);
    # the +1/16 Cs margin keeps typical counts inside the same
    # {2^k, 1.5*2^k} bucket the observation fell in.
    ctx.caps[ctx.cap_key] = (
        tuple(max(_bucket(ct + ct // 16 + 64), 512) for ct in Cs_true),
        max(_bucket(K + K // 16 + 64), 4 * B),
        tuple(max(_bucket(n + n // 8 + 8), 8) for n in nblks_true))
    ctx.finish(packed)
    return True


@partial(jax.jit, static_argnames=("subdiv", "levels", "caps", "K_cap",
                                   "mips", "pads", "ntxs", "all_active",
                                   "nblks", "HWs", "rcps", "alpha_cutoff",
                                   "fmt", "promotion", "cutoff_gt",
                                   "cutoff_le", "periods", "exact",
                                   "bf16x3s"))
def _spec_chain(cls_levels, tilesEs, uv7, active, fz, *, subdiv,
                levels, caps, K_cap, mips, pads, ntxs, all_active, nblks,
                HWs, rcps, alpha_cutoff, fmt, promotion, cutoff_gt,
                cutoff_le, periods=None, exact="pallas", bf16x3s=None):
    """The whole speculative batch (descent A+B, per-mip C, compact D) as
    ONE jit dispatch: on a tunnel-attached chip every dispatch pays
    host-link latency, so the chain must cross the link once, not
    3 + mip_count times.  uv7 = (T, 7) fused [uv columns | ccw] upload
    (one H2D per batch instead of two)."""
    uv_flat = uv7[:, :6]
    ccw = uv7[:, 6] > jnp.float32(0.5)
    res = _stageAB(cls_levels, uv_flat, active, fz, subdiv=subdiv,
                   levels=levels, caps=caps, K_cap=K_cap, mips=mips,
                   pads=pads, ntxs=ntxs, all_active=all_active,
                   periods=periods)
    (sides, nodes, ids, kvalid, meta, slots) = res
    mip_counts = []
    for mip, (w, h) in enumerate(mips):
        mip_counts.append(_stageC_mip(
            tilesEs[mip], uv_flat, ccw, ids, kvalid, slots[mip][0],
            slots[mip][1], fz, subdiv=subdiv, K_cap=K_cap, nblk=nblks[mip],
            w=w, h=h, pad=pads[mip], ntx=ntxs[mip], H=HWs[mip][0],
            W=HWs[mip][1], rcp=rcps[mip], alpha_cutoff=alpha_cutoff,
            period=periods[mip] if periods else None, exact=exact,
            bf16x3=bf16x3s[mip] if bf16x3s else False))
    return _stageD_spec(sides, tuple(mip_counts), meta, fmt=fmt,
                        promotion=promotion, cutoff_gt=cutoff_gt,
                        cutoff_le=cutoff_le, nblk_caps=nblks)


@partial(jax.jit, static_argnames=("NB", "subdiv", "levels", "caps",
                                   "K_cap", "mips", "pads", "ntxs",
                                   "nblks", "HWs", "rcps", "alpha_cutoff",
                                   "fmt", "promotion", "cutoff_gt",
                                   "cutoff_le", "periods", "exact",
                                   "bf16x3s"))
def _spec_chain_multi(cls_levels, tilesEs, uv7s, fz, *, NB, subdiv, levels,
                      caps, K_cap, mips, pads, ntxs, nblks, HWs, rcps,
                      alpha_cutoff, fmt, promotion, cutoff_gt, cutoff_le,
                      periods=None, exact="pallas", bf16x3s=None):
    """NB identical-signature speculative chains as ONE dispatch returning
    ONE flat payload: on the tunnel-attached chip every stream operation
    (H2D, Execute, D2H) pays a fixed link cost, so a 4-sub-batch rep goes
    from ~12 stream ops (4 uploads + 4 dispatches + 2 concats + 2
    fetches) to 3.  Trade-off: the chunked fetch's reconstruct-during-
    compute overlap is lost and the program compiles NB bodies —
    OMM_TP_MEGACHAIN gates it for the chip sweep.  uv7s: (NB, T, 7)."""
    act = jnp.ones((1, 1), bool)
    outs = []
    for b in range(NB):
        outs.append(_spec_chain(
            cls_levels, tilesEs, uv7s[b], act, fz, subdiv=subdiv,
            levels=levels, caps=caps, K_cap=K_cap, mips=mips, pads=pads,
            ntxs=ntxs, all_active=True, nblks=nblks, HWs=HWs, rcps=rcps,
            alpha_cutoff=alpha_cutoff, fmt=fmt, promotion=promotion,
            cutoff_gt=cutoff_gt, cutoff_le=cutoff_le, periods=periods,
            exact=exact, bf16x3s=bf16x3s))
    return jnp.concatenate(outs)


class _PayloadStub:
    """Shape-only stand-in for a batch's device payload when it lives
    inside a mega-chain's fused buffer (the drain loop slices by shape)."""

    def __init__(self, n):
        self.shape = (n,)


def _try_enqueue_mega(live, nmips):
    """One fused dispatch for all live batches when OMM_TP_MEGACHAIN=1
    and every batch shares the speculative signature (same caps entry,
    statics, all-active).  Returns (chunk, device_payload) or None."""
    import os
    if os.environ.get("OMM_TP_MEGACHAIN", "0") != "1" or len(live) < 2:
        return None
    c0 = live[0][1]
    entry = c0.caps.get(c0.cap_key)
    if entry is None or len(entry) < 3 or not c0.all_active:
        return None
    for _, c in live[1:]:
        if (c.cap_key != c0.cap_key or not c.all_active
                or c.mips != c0.mips or c.pads != c0.pads
                or c.ntxs != c0.ntxs or c.HWu != c0.HWu
                or c.periods != c0.periods
                or c.bf16oks != c0.bf16oks):
            return None
    Cs, K_cap, nblks = entry
    uv7s = np.stack([np.concatenate(
        [c.uv_flat, c.ccw.astype(np.float32)[:, None]], axis=1)
        for _, c in live])
    try:
        dev = _spec_chain_multi(
            c0.cls_tuple, tuple(c0.tilesEs), jnp.asarray(uv7s), _fz0(),
            NB=len(live), subdiv=c0.subdiv, levels=c0.levels,
            caps=tuple(Cs), K_cap=K_cap, mips=tuple(c0.mips),
            pads=tuple(c0.pads), ntxs=tuple(c0.ntxs), nblks=tuple(nblks),
            HWs=tuple(c0.HWu), rcps=tuple(c0.rcps),
            alpha_cutoff=float(c0.cfg.alpha_cutoff), fmt=c0.cfg.fmt,
            promotion=c0.cfg.promotion, cutoff_gt=c0.cfg.cutoff_gt,
            cutoff_le=c0.cfg.cutoff_le, periods=tuple(c0.periods),
            exact=c0.exact, bf16x3s=tuple(c0.bf16oks))
        dev.copy_to_host_async()
    except fb.KERNEL_FALLBACK_ERRORS as e:
        fb.record("twophase.mega_chain", e)
        return None
    L = dev.shape[0] // len(live)
    chunk = [(k, (_PayloadStub(L), tuple(Cs), K_cap)) for k, _ in live]
    return chunk, dev


@jax.jit
def _concat_payloads(bufs):
    """Device-side concatenation of per-batch compressed payloads so a
    multi-batch call crosses the tunnel ONCE: every separate fetch pays
    the link's fixed round-trip cost (~26.5 ms on the axon tunnel),
    which dominates the per-batch transfer itself (~100 KB)."""
    return jnp.concatenate(bufs)


def _enqueue_batch_spec(ctx: _BatchCtx):
    """Single-sync speculative pipeline: the whole stage chain is ONE jit
    dispatch with cached capacities; overflow is detected in the meta
    header of the one fetched payload.  Returns (device payload, C_cap,
    K_cap) or None if speculation unavailable."""
    entry = ctx.caps.get(ctx.cap_key)
    if entry is None or len(entry) < 3:
        return None
    Cs, K_cap, nblks = entry
    try:
        dev = _spec_chain(
            ctx.cls_tuple, tuple(ctx.tilesEs),
            ctx.uv7J, ctx.actJ, _fz0(), subdiv=ctx.subdiv,
            levels=ctx.levels, caps=tuple(Cs), K_cap=K_cap,
            mips=tuple(ctx.mips),
            pads=tuple(ctx.pads), ntxs=tuple(ctx.ntxs),
            all_active=ctx.all_active, nblks=tuple(nblks),
            HWs=tuple(ctx.HWu), rcps=tuple(ctx.rcps),
            alpha_cutoff=float(ctx.cfg.alpha_cutoff), fmt=ctx.cfg.fmt,
            promotion=ctx.cfg.promotion, cutoff_gt=ctx.cfg.cutoff_gt,
            cutoff_le=ctx.cfg.cutoff_le, periods=tuple(ctx.periods),
            exact=ctx.exact, bf16x3s=tuple(ctx.bf16oks))
        return (dev, tuple(Cs), K_cap)
    except fb.KERNEL_FALLBACK_ERRORS as e:
        # toolchain gap (Mosaic lowering / backend compile): recorded +
        # warned, then the synchronous path takes the batch
        fb.record("twophase.spec_chain", e)
        return None


#: host-side phase trace (label, seconds-since-call-start) appended per
#: classify_work_items_batches call when OMM_TP_TRACE is set — the wall
#: clock attribution tool for tunnel-attached tuning (device-op times
#: come from jax.profiler; this covers the host half).
TRACE: list = []


def classify_work_items_batches(texture: Texture, cfg, batches, subdiv,
                                post_out: list | None = None,
                                packed_out: bool = False,
                                packed_sink=None,
                                exact_engine: str | None = None):
    """Classify several batches, pipelined: all speculative device chains
    are enqueued up-front so each batch's result fetch overlaps the next
    batches' device execution.  Returns a list of per-batch state lists.

    subdiv: one level for every batch (int), or one level PER batch
    (sequence) — a mixed-subdivision mesh then runs as ONE pipelined
    call: every level's chains enqueue before any fetch drains, so the
    fixed link tail is paid once instead of once per level (the
    reference drives mixed levels as per-level indirect dispatches in
    one command stream, bake_gpu_impl.cpp:992-996).

    post_out: optional list; receives one dict per batch mapping item
    index -> (states3 digest, uniform value) for items whose post pass
    ran fused with the C++ payload replay (native.row_post) — the bake
    tail's exact-dedup and promotion reuse these instead of re-scanning
    each 4^N-byte state array.

    packed_out: opt-in; ALL-ACTIVE fast-path items come back as
    PackedStates (serialize-ready sequential 2-bit rows — the replay
    writes 4x less memory and the bake never materializes the unpacked
    arrays).  Items on slow/fallback paths still return (M,) uint8
    arrays — callers must handle both forms.

    packed_sink: optional (blob, dsts) speculative-serialize sink;
    dsts[bi][i] is batch bi item i's byte offset in `blob` (the final
    result blob, morton-order layout) or -1, dsts[bi] may be None.  The
    packed replay writes rows in place at those offsets (PackedStates
    gain `blob_offset`) so the bake's serialize stage can skip its row
    copies after validating the layout held."""
    import os
    import time as _time

    from .jax_classify import classify_work_item_jax

    subdivs = ([int(subdiv)] * len(batches) if np.isscalar(subdiv)
               else [int(s) for s in subdiv])
    assert len(subdivs) == len(batches)

    # Exact-stage engine selection ("pallas" default / "xla" = the
    # ComputeOnly engine: same pipeline, kernel body through pure XLA).
    # OMM_TP_EXACT overrides for A/B sweeps.
    exact = exact_engine or os.environ.get("OMM_TP_EXACT", "pallas")
    assert exact in ("pallas", "xla"), exact

    if os.environ.get("OMM_TP_TRACE"):
        _tb = _time.perf_counter()
        _mark = lambda lab: TRACE.append((lab, _time.perf_counter() - _tb))
    else:
        _mark = lambda lab: None

    # build each batch's context and enqueue its speculative chain
    # IMMEDIATELY (the device starts on batch 0 while later batches'
    # host prep runs); slow-path items are deferred until every chain is
    # queued, then fetches go through a small thread pool so a batch's
    # host-side reconstruction overlaps the next batch's transfer
    results = []
    ctxs = []
    pending = []
    slow = []

    # Chunked fused fetch: group payloads into a few device-side
    # concatenations, each issued IN STREAM ORDER right after its last
    # member chain is enqueued — the device stream is FIFO, so a concat
    # issued after ALL chains could not start until every batch had
    # finished, and chunk 0's payload would arrive no earlier than the
    # fully-fused form's.  Flushing chunk j before chunk j+1's chains
    # are enqueued lets chunk j's D2H stream back (copy_to_host_async)
    # while chunk j+1 still computes, hiding the host-side
    # reconstruction behind device work.  Fusing within a chunk still
    # amortizes the link's fixed per-fetch round-trip cost.
    fetches = []  # (chunk, device array | None) — one D2H per chunk

    def _flush_chunk(ch):
        if not ch:
            return
        try:
            cat = (_concat_payloads(tuple(p[0] for _, p in ch))
                   if len(ch) > 1 else ch[0][1][0])
            cat.copy_to_host_async()
            fetches.append((ch, cat))
        except fb.KERNEL_FALLBACK_ERRORS as e:
            fb.record("twophase.fused_fetch", e)
            fetches.append((ch, None))

    nch = max(1, int(os.environ.get("OMM_TP_FETCH_CHUNKS", "2")))
    nch = min(nch, max(1, len(batches)))
    # Unequal chunks, LAST chunk smallest (one batch): the last chunk's
    # reconstruction is the pipeline's non-overlapped tail — there is no
    # later device work to hide it behind — while earlier chunks' replay
    # overlaps the remaining batches' compute + transfer.  Measured host
    # marks (sb=64, chunks=2, equal [2,2]): fetch1->recon was a ~17 ms
    # tail; [3,1] halves it.
    if nch > 1:
        rest, k = len(batches) - 1, nch - 1
        chunk_sizes = [rest // k + (1 if i < rest % k else 0)
                       for i in range(k)] + [1]
        chunk_sizes = [s for s in chunk_sizes if s > 0]
    else:
        chunk_sizes = [len(batches)]
    chunk_idx = [0]  # consumed in order; enqueue runs on ONE thread
    cur_chunk = []

    # Dedicated enqueue thread: on a tunnel-attached chip every device-
    # stream operation (H2D upload, Execute, D2H initiation) blocks the
    # issuing thread on the link's ack (~the one-way latency), which
    # serializes with the next batch's host prep when issued from the
    # main thread.  One single-worker executor owns ALL stream ops, so
    # stream ORDER is unchanged (same FIFO, same chunk flush points) and
    # ack waits overlap ctx builds.  OMM_TP_ENQUEUE_THREAD=0 restores
    # in-line enqueueing.
    import concurrent.futures as cf
    enq_pool = (cf.ThreadPoolExecutor(max_workers=1)
                if os.environ.get("OMM_TP_ENQUEUE_THREAD", "1") != "0"
                and len(batches) > 1 else None)
    enq_futs = []

    def _enqueue_and_chunk(k, ctx):
        # runs on the enqueue thread (or inline): dispatch the chain,
        # then flush the chunk if this batch completed it
        p = _enqueue_batch_spec(ctx) if ctx is not None else None
        pending[k] = p
        _mark(f"enq{k}")
        if p is not None:
            cur_chunk.append((k, p))
            ci = chunk_idx[0]
            if (ci < len(chunk_sizes)
                    and len(cur_chunk) >= chunk_sizes[ci]):
                _flush_chunk(list(cur_chunk))
                cur_chunk.clear()
                chunk_idx[0] = ci + 1

    # Pass 1 (host, vectorized): route every item of every batch.  The
    # routing scans are cheap (fresh items scan nothing) and running
    # them up-front lets the group level, descent schedule, and
    # span-window maxima be computed ONCE over the whole call's fast
    # set PER LEVEL instead of once per batch — and guarantees every
    # same-level batch shares one jit signature (identical
    # pads/windows), so caps/cache entries and the mega-chain always
    # apply call-wide.
    routed = []  # (items, out, todo, mins)
    for items in batches:
        out = [None] * len(items)
        todo = []
        mins = {}
        for i, (uv, st) in enumerate(items):
            # states=None declares a fresh item (all UnknownOpaque)
            # without allocating or scanning the 4^subdiv-byte array.
            # Otherwise states are in {0..3}: min()==UO(3) <=> ALL
            # UnknownOpaque (decided with ONE byte scan); only mixed
            # states need the second (max) scan for "some UO left"
            if st is None:
                mins[i] = UO
                todo.append(i)
                continue
            mn = int(st.min())
            mins[i] = mn
            if mn == UO or int(st.max()) == UO:
                todo.append(i)
            else:
                out[i] = st
        routed.append((items, out, todo, mins))
        results.append(out)

    by_level: dict[int, list[int]] = {}
    for bi, sd in enumerate(subdivs):
        by_level.setdefault(sd, []).append(bi)
    lgs: dict[int, int] = {}
    for sd, bis in by_level.items():
        uvs = [routed[bi][0][i][0] for bi in bis
               for i in routed[bi][2]]
        lgs[sd] = _group_level(texture, uvs, sd) if uvs else 1
    fast_lists = [None] * len(batches)
    fast_uvs_lv: dict[int, list] = {sd: [] for sd in by_level}
    for bi, ((items, out, todo, mins), sd) in enumerate(
            zip(routed, subdivs)):
        fast = []
        if todo:
            mask = _fast_path_mask(
                texture, cfg, np.stack([items[i][0] for i in todo]),
                sd, lgs[sd])
            for k, i in enumerate(todo):
                if mask[k]:
                    fast.append(i)
                else:
                    slow.append((items, out, i, sd))
        fast_lists[bi] = fast
        fast_uvs_lv[sd].extend(items[i][0] for i in fast)
    precomps: dict[int, dict | None] = {}
    for sd, fast_uvs in fast_uvs_lv.items():
        if not fast_uvs:
            precomps[sd] = None
            continue
        lg = lgs[sd]
        levels = _descend_levels(texture, fast_uvs, sd, lg)
        uv_all = np.stack(fast_uvs)
        HW = []
        HWl = [[] for _ in levels]
        for mip in range(texture.mip_count):
            Hbs, Wbs = _span_windows(texture, uv_all, sd, mip)
            HW.append((int(Hbs.max()), int(Wbs.max())))
            for li, lv in enumerate(levels):
                Hls, Wls = _span_windows(texture, uv_all, lv, mip)
                HWl[li].append((int(Hls.max()), int(Wls.max())))
        precomps[sd] = {"lg": lg, "levels": levels, "HW": HW, "HWl": HWl}
    _mark("precomp")

    # Pass 2: build each batch's ctx and enqueue it immediately (the
    # device starts on batch 0 while later batches' ctxs build)
    for bi, ((items, out, todo, mins), fast, sd) in enumerate(
            zip(routed, fast_lists, subdivs)):
        sink = None
        if (packed_sink is not None and packed_out
                and packed_sink[1][bi] is not None):
            sink = (packed_sink[0], packed_sink[1][bi])
        ctx = _BatchCtx(texture, cfg, items, sd, fast, out,
                        all_active=all(mins[i] == UO for i in fast),
                        precomp=precomps[sd],
                        want_post=post_out is not None,
                        want_packed=packed_out, sink=sink,
                        exact=exact) \
            if fast else None
        _mark(f"ctx{len(ctxs)}")
        ctxs.append(ctx)
        k = len(ctxs) - 1
        pending.append(None)
        if os.environ.get("OMM_TP_MEGACHAIN", "0") == "1":
            continue  # fused dispatch below, after every ctx is built
        if enq_pool is not None:
            enq_futs.append(enq_pool.submit(_enqueue_and_chunk, k, ctx))
        else:
            _enqueue_and_chunk(k, ctx)
    if os.environ.get("OMM_TP_MEGACHAIN", "0") == "1":
        live = [(k, c) for k, c in enumerate(ctxs) if c is not None]
        mega = _try_enqueue_mega(live, texture.mip_count) if live else None
        if mega is not None:
            chunk, dev = mega
            for k, p in chunk:
                pending[k] = p
            fetches.append((chunk, dev))
            _mark("mega_enq")
        else:
            # signature mismatch / cold caps: the per-batch pipeline
            for k, c in enumerate(ctxs):
                if enq_pool is not None:
                    enq_futs.append(
                        enq_pool.submit(_enqueue_and_chunk, k, c))
                else:
                    _enqueue_and_chunk(k, c)
    if enq_pool is not None:
        try:
            enq_futs.append(enq_pool.submit(_flush_chunk, cur_chunk))
            for f in enq_futs:
                f.result()  # propagate enqueue errors; all ops issued
        finally:
            # on an enqueue error, cancel still-queued dispatches so the
            # device does not keep executing work the caller abandoned
            enq_pool.shutdown(wait=True, cancel_futures=True)
    else:
        _flush_chunk(cur_chunk)
    _mark("concat_enq")

    def _states_of(st, sd):
        return np.full(get_num_micro_triangles(sd), UO, np.uint8) \
            if st is None else st

    def _classify_slow(uv_tri, states, sd):
        """Route one non-fast-path item like bake()'s _fine does:
        classify_work_item_jax implements the linear-filter level-line
        semantics for NON-degenerate triangles only — anything else
        (degenerate lines, nearest filter, level-line disabled) must go
        to its own device path or the exact host engine."""
        if (cfg.filter == TextureFilterMode.Linear
                and not getattr(cfg, "disable_level_line", False)
                and not getattr(cfg, "disable_fine", False)):
            if bool(geom.is_degenerate(uv_tri)):
                from .jax_classify import classify_degenerate_device
                return classify_degenerate_device(texture, cfg, uv_tri,
                                                  sd, states)
            return classify_work_item_jax(texture, cfg, uv_tri, sd,
                                          states)
        from .. import engine
        return engine.resample_fine_item(texture, cfg, uv_tri, sd,
                                         states)

    for items, out, i, sd in slow:
        out[i] = _classify_slow(items[i][0], _states_of(items[i][1], sd),
                                sd)

    nmip = texture.mip_count

    def finish_one(ctx, p, buf):
        """Parse one batch's payload and reconstruct its states (worker
        thread; the C++ replay releases the GIL).  buf=None means the
        chunk's concat fell back — fetch this batch's payload alone.
        Returns True unless the speculative capacities overflowed."""
        if buf is None:
            buf = np.asarray(p[0])  # the batch's one sync
        m = len(ctx.levels) - 1
        mrow = buf[:4 * (m + 2 + nmip)].view(np.int32)
        if int(mrow[m + 1]) != 0:
            return False
        _, Cs_cap, K_cap = p
        ctx.finish_compact(buf, Cs_cap, K_cap,
                           [int(x) for x in mrow[:m]], int(mrow[m]))
        return True

    # drain chunks in order: chunk j's reconstructions run on worker
    # threads while the main thread blocks on chunk j+1's sync (and the
    # device is still executing chunk j+1's batches)
    statuses: dict[int, bool] = {}
    pool = cf.ThreadPoolExecutor(max_workers=4)
    try:
        futs: dict[int, cf.Future] = {}
        for ci, (ch, cat) in enumerate(fetches):
            if cat is None:
                # concat fell back: each batch fetches its own payload
                for k, p in ch:
                    futs[k] = pool.submit(finish_one, ctxs[k], p, None)
                continue
            flat = np.asarray(cat)  # the chunk's one sync
            _mark(f"fetch{ci}")
            o = 0
            for k, p in ch:
                n = int(p[0].shape[0])
                futs[k] = pool.submit(finish_one, ctxs[k], p,
                                      flat[o:o + n])
                o += n
        for k, fut in futs.items():
            statuses[k] = fut.result()
        _mark("recon")
    finally:
        pool.shutdown(wait=True)

    for k, (ctx, p) in enumerate(zip(ctxs, pending)):
        if ctx is None:
            continue
        ok = statuses.get(k, False)
        if not ok:
            # overflow or no cached caps: the synchronous
            # capacity-discovering path takes the batch
            ok = _run_batch_sync(ctx)
        if not ok and ctx.exact == "pallas":
            # Mosaic toolchain gap (or persistent overflow): retry the
            # SAME pipeline once with the exact stage through pure XLA
            # (the ComputeOnly engine, ~0.35x the default on chip)
            # before dropping to the flat-resolve fallback (~0.03x) —
            # a Pallas regression then costs 3x, not 30x
            ctx.exact = "xla"
            ok = _run_batch_sync(ctx)
        if not ok:
            # Pallas/capacity fallback: flat window resolve + XLA
            # survivors kernel over ONE compacted contour stream for the
            # whole batch (fast-path preconditions already hold for
            # ctx.fast items); dense per-item path as last resort
            from .jax_classify import classify_linear_survivors_batch
            sd = ctx.subdiv
            fit = [(ctx.items[i][0], _states_of(ctx.items[i][1], sd))
                   for i in ctx.fast]
            pre = resolve_linear_phase1(texture, cfg, fit, sd)
            if pre is not None:
                res = classify_linear_survivors_batch(
                    texture, cfg,
                    [(ctx.items[i][0], pre[t])
                     for t, i in enumerate(ctx.fast)], sd)
                for i, st in zip(ctx.fast, res):
                    ctx.out[i] = st
            else:
                for i in ctx.fast:
                    ctx.out[i] = classify_work_item_jax(
                        texture, cfg, ctx.items[i][0], sd,
                        _states_of(ctx.items[i][1], sd))
            ctx.post = {}
    if post_out is not None:
        for k in range(len(batches)):
            ctx = ctxs[k] if k < len(ctxs) else None
            post_out.append(dict(ctx.post) if ctx is not None else {})
    _mark("done")
    return results


def classify_work_items_batch(texture: Texture, cfg, items, subdiv: int):
    """Classify a batch of work items sharing one subdivision level.

    items: list of (uv_tri, states) — states uint8 (M,) or None (fresh
    item: all UnknownOpaque, saving the caller the 4^subdiv-byte
    allocation and the engine the activity scan); micro-triangles
    with state == UnknownOpaque are classified.  Returns the list of new
    state arrays.  Items that fail the fast-path preconditions fall back
    to the XLA gather path individually; device-side capacity overflow
    grows the buckets and retries (correctness never depends on the fast
    path)."""
    return classify_work_items_batches(texture, cfg, [items], subdiv)[0]


def classify_work_item_twophase(texture: Texture, cfg, uv_tri: np.ndarray,
                                subdiv: int, states: np.ndarray):
    """Single-item wrapper over classify_work_items_batch."""
    return classify_work_items_batch(texture, cfg, [(uv_tri, states)],
                                     subdiv)[0]


# ---------------------------------------------------------------------------
# linear-filter phase-1 resolve (flat, no hierarchy — the ComputeOnly
# engine's window pre-pass; stage B of the two-phase engine run alone)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("subdiv", "mips", "pads",
                                   "periods"))
def _linear_sides(cls_planes, uv_flat, fz, *, subdiv, mips, pads,
                  periods=None):
    """Per-micro-triangle combined-over-mips window side for every
    micro-triangle of every item: the two-phase engine's micro resolve
    (_sides_for at the finest level) evaluated densely over (T, M)."""
    T = uv_flat.shape[0]
    M = get_num_micro_triangles(subdiv)
    node = jnp.arange(T * M, dtype=jnp.int32)
    side = _sides_for((node & (M - 1)).astype(jnp.uint32),
                      node >> (2 * subdiv), subdiv,
                      uv_flat, cls_planes, mips, pads, fz,
                      periods=periods)
    return side.reshape(T, M)


@partial(jax.jit, static_argnames=("subdiv", "mips", "pads",
                                   "periods"))
def _linear_sides_packed(cls_planes, uv_flat, fz, *, subdiv, mips, pads,
                         periods=None):
    """_linear_sides with the (T, M) int8 side map packed 4-per-byte on
    device before the fetch: side ∈ {-1, 0, +1} → 2-bit code side+1.
    The dense side map is the ComputeOnly engine's D2H payload (16 MB at
    64 tris × subdiv 9) and the tunnel moves ~46 MB/s, so the fetch
    dominated phase-1 (measured 615 ms full-fetch vs 252 ms compute-
    only); packing cuts the wire bytes 4×.  Requires M % 4 == 0
    (subdiv ≥ 1 — callers keep subdiv-0 on the unpacked form)."""
    side = _linear_sides.__wrapped__(cls_planes, uv_flat, fz,
                                     subdiv=subdiv, mips=mips, pads=pads,
                                     periods=periods)
    T, M = side.shape
    code = (side + jnp.int8(1)).astype(jnp.uint8).reshape(T, M // 4, 4)
    return (code[..., 0] | (code[..., 1] << 2) | (code[..., 2] << 4)
            | (code[..., 3] << 6))


def _unpack_sides(packed: np.ndarray, M: int) -> np.ndarray:
    """Host inverse of _linear_sides_packed's 2-bit codes → int8 sides."""
    T = packed.shape[0]
    codes = np.empty((T, M), np.uint8)
    codes[:, 0::4] = packed & 3
    codes[:, 1::4] = (packed >> 2) & 3
    codes[:, 2::4] = (packed >> 4) & 3
    codes[:, 3::4] = (packed >> 6) & 3
    return codes.astype(np.int8) - np.int8(1)


def resolve_linear_phase1(texture: Texture, cfg, items, subdiv: int):
    """Phase-1 window resolve for linear-filter work items, WITHOUT the
    hierarchical descent or the Pallas exact kernel: micro-triangles
    whose (combined-over-mips) texel window sits strictly on one side of
    the alpha cutoff get their final state; contour survivors stay
    UnknownOpaque for an exact pass (classify_linear_survivors or the
    host engine).  Exactness argument = the two-phase engine's micro
    resolve (see the module docstring: a one-sided window forces every
    per-texel increment and the bilinear seed to that side, and
    PHASE1_MARGIN keeps fp32-borderline texels unresolved).  Returns the
    updated per-item state list, or None when any item fails the
    window-containment preconditions (_fast_path_mask)."""
    if not items:
        return []
    uv_arr = np.stack([it[0] for it in items])
    lg = _group_level(texture, [it[0] for it in items], subdiv)
    if not _fast_path_mask(texture, cfg, uv_arr, subdiv, lg).all():
        return None

    cutoff = float(cfg.alpha_cutoff)
    ba = float(getattr(cfg, "border_alpha", 0.0))
    mips, pads, cls_planes, periods = [], [], [], []
    for mip in range(texture.mip_count):
        Hbs, Wbs = _span_windows(texture, uv_arr, subdiv, mip)
        Hb, Wb = int(Hbs.max()), int(Wbs.max())
        TSA = TILE + max(Hb + 2, Wb + 2)
        pad = TSA
        period = _period_for(texture, cfg.addr_mode, mip)
        periods.append(period)
        mips.append(texture.size(mip))
        pads.append(pad)
        cls_planes.append(_cls_cached(texture, mip, cfg.addr_mode, pad,
                                      TSA, Hb, Wb, cutoff, PHASE1_MARGIN,
                                      ba, period))

    uv_flat = uv_arr.reshape(len(items), 6).astype(np.float32)
    if subdiv >= 1:
        side = _unpack_sides(np.asarray(_linear_sides_packed(
            tuple(cls_planes), jnp.asarray(uv_flat), _fz0(),
            subdiv=subdiv, mips=tuple(mips), pads=tuple(pads),
            periods=tuple(periods))), get_num_micro_triangles(subdiv))
    else:
        side = np.asarray(_linear_sides(
            tuple(cls_planes), jnp.asarray(uv_flat), _fz0(),
            subdiv=subdiv, mips=tuple(mips), pads=tuple(pads),
            periods=tuple(periods)))

    st_gt = np.uint8(int(cfg.cutoff_gt))
    st_le = np.uint8(int(cfg.cutoff_le))
    out = []
    for t, (uv_tri, states) in enumerate(items):
        st = np.full(get_num_micro_triangles(subdiv), UO, np.uint8) \
            if states is None else states.copy()
        act = st == UO
        st[act & (side[t] == 1)] = st_gt
        st[act & (side[t] == -1)] = st_le
        out.append(st)
    return out


# ---------------------------------------------------------------------------
# nearest-filter phase-1 resolve (bake_cpu_impl.cpp:969-1022 semantics)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("subdiv", "mips", "pads",
                                   "periods"))
def _nearest_sides(cls_planes, uv_flat, *, subdiv, mips, pads,
                   periods=None):
    """Per-micro-triangle side for nearest-filter items: the kernel loads
    single texels at wrapped coords over the conservative window
    [floor(min(q)), ceil(max(q))) with q = muv*size (NO -0.5 offset), and
    counts above/below by a direct `cutoff < alpha` compare — so a
    strictly one-sided texel window determines the state with no rounding
    slack at all.  Returns (T, M) int8 combined over mips."""
    T = uv_flat.shape[0]
    M = get_num_micro_triangles(subdiv)
    bu, bv, bd = _bary_cols(jnp.arange(M, dtype=jnp.uint32), subdiv)
    tri6 = tuple(uv_flat[:, k:k + 1] for k in range(6))
    (ax, ay), (bx, by), (cx, cy) = _corner_cols(tri6, bu[None, :],
                                                bv[None, :], bd[None, :])
    side = None
    for mi, (w, h) in enumerate(mips):
        pad = pads[mi]
        wf = jnp.float32(float(w))
        hf = jnp.float32(float(h))
        from .levelline import guard as _g
        qxm = _g(jnp, jnp.minimum(jnp.minimum(ax, bx), cx) * wf)
        qym = _g(jnp, jnp.minimum(jnp.minimum(ay, by), cy) * hf)
        x0 = jnp.floor(qxm).astype(jnp.int32)
        y0 = jnp.floor(qym).astype(jnp.int32)
        x0, y0 = _wrap_origin(x0, y0, periods[mi] if periods else None)
        s = cls_planes[mi][y0 - 1 + pad, x0 - 1 + pad]
        side = s if side is None else jnp.where(s == side, side,
                                                jnp.int8(0))
    return side


@partial(jax.jit, static_argnames=("subdiv", "mips", "pads",
                                   "periods"))
def _nearest_sides_packed(cls_planes, uv_flat, *, subdiv, mips, pads,
                          periods=None):
    """_nearest_sides with the (T, M) int8 map packed 4-per-byte on
    device before the fetch (same D2H rationale as
    _linear_sides_packed; requires subdiv ≥ 1)."""
    side = _nearest_sides.__wrapped__(cls_planes, uv_flat, subdiv=subdiv,
                                      mips=mips, pads=pads,
                                      periods=periods)
    T, M = side.shape
    code = (side + jnp.int8(1)).astype(jnp.uint8).reshape(T, M // 4, 4)
    return (code[..., 0] | (code[..., 1] << 2) | (code[..., 2] << 4)
            | (code[..., 3] << 6))


def resolve_nearest_phase1(texture: Texture, cfg, items, subdiv: int):
    """Phase-1 window resolve for nearest-filter work items: resolved
    micro-triangles get their final state; survivors stay UnknownOpaque
    for the exact host pass (engine.resample_fine_item).  Exactness: the
    nearest kernel has no seed sample and no interpolation, so above=0
    (all window texels <= cutoff) forces state cutoff_le and below=0
    forces cutoff_gt — except when the conservative raster covers zero
    texels (above=below=0 -> cutoff_le), which is only possible for
    micro-triangles small enough that fp32 edge-function rounding can
    empty the mask; the span gate below keeps those on the exact path.
    Returns the updated per-item state list or None (preconditions).
    Border mode is admitted: the nearest kernel has no seed sample, so the
    borderAlpha-filled padded plane is value-exact everywhere."""
    if cfg.filter != TextureFilterMode.Nearest or subdiv < 2:
        return None
    for uv_tri, _ in items:
        if bool(geom.is_degenerate(uv_tri)):
            return None
        for mip in range(texture.mip_count):
            w, h = texture.size(mip)
            q = uv_tri.astype(np.float64) * np.array([w, h], np.float64)
            span = (q.max(axis=0) - q.min(axis=0)) * 2.0 ** -subdiv
            # span gate: micro-triangles far above fp32 edge-test noise
            if span.min() < 0.25:
                return None
            Hb, Wb = _span_window(texture, uv_tri, subdiv, mip)
            TSA = TILE + max(Hb + 2, Wb + 2)
            pad = TSA
            tmin = np.floor(q.min(axis=0)) - 2
            tmax = np.ceil(q.max(axis=0)) + 2
            if _period_for(texture, cfg.addr_mode, mip) is not None:
                # periodic modes: modular anchors need no containment
                # (see _fast_path_mask for the guards)
                if (np.abs(q) >= 2.0 ** 30).any():
                    return None
                if (cfg.addr_mode == TextureAddressMode.Wrap
                        and not texture.info[mip].is_pow2
                        and (tmin[0] < 1 or tmin[1] < 1)):
                    return None
            elif (tmin[0] < 1 - pad or tmin[1] < 1 - pad
                    or tmax[0] + Wb + 6 > w + pad
                    or tmax[1] + Hb + 6 > h + pad):
                return None

    cutoff = float(cfg.alpha_cutoff)
    mips, pads, cls_planes, periods = [], [], [], []
    for mip in range(texture.mip_count):
        Hb = max(_span_window(texture, it[0], subdiv, mip)[0]
                 for it in items)
        Wb = max(_span_window(texture, it[0], subdiv, mip)[1]
                 for it in items)
        TSA = TILE + max(Hb + 2, Wb + 2)
        pad = TSA
        period = _period_for(texture, cfg.addr_mode, mip)
        periods.append(period)
        mips.append(texture.size(mip))
        pads.append(pad)
        cls_planes.append(_cls_cached(texture, mip, cfg.addr_mode, pad,
                                      TSA, Hb, Wb, cutoff, PHASE1_MARGIN,
                                      float(getattr(cfg, "border_alpha",
                                                    0.0)), period))

    uv_flat = np.stack([it[0].reshape(6) for it in items]).astype(np.float32)
    if subdiv >= 1:
        side = _unpack_sides(np.asarray(_nearest_sides_packed(
            tuple(cls_planes), jnp.asarray(uv_flat), subdiv=subdiv,
            mips=tuple(mips), pads=tuple(pads),
            periods=tuple(periods))), get_num_micro_triangles(subdiv))
    else:
        side = np.asarray(_nearest_sides(
            tuple(cls_planes), jnp.asarray(uv_flat), subdiv=subdiv,
            mips=tuple(mips), pads=tuple(pads), periods=tuple(periods)))

    st_gt = np.uint8(int(cfg.cutoff_gt))
    st_le = np.uint8(int(cfg.cutoff_le))
    out = []
    for t, (uv_tri, states) in enumerate(items):
        # states=None is the declared fresh-item form (all UnknownOpaque)
        st = np.full(get_num_micro_triangles(subdiv), UO, np.uint8) \
            if states is None else states.copy()
        act = st == UO
        st[act & (side[t] == 1)] = st_gt
        st[act & (side[t] == -1)] = st_le
        out.append(st)
    return out
