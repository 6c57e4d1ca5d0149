"""Multi-chip bake: shard the micro-triangle axis over a device mesh.

The reference's only parallelism is OpenMP threads over work items
(bake_cpu_impl.cpp:735,833) — the TPU-native equivalent is data parallelism
over the micro-triangle axis via shard_map on a jax Mesh, with psum for the
global histograms (SURVEY.md §2.9/§5.8).  Each chip holds a texture replica
and classifies a contiguous bird-order slice of the micro-triangles; ICI
collectives only fire at the final histogram/stats reduction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import bird, geom
from ..kernels.jax_classify import _bilinear_seed
from ..kernels.levelline import (conservative_raster_mask,
                                 get_state_from_coverage,
                                 level_line_texel_kernel, make_tri_params)
from ..types import get_num_micro_triangles

OMM_AXIS = "omm"


def make_mesh(devices=None, axis: str = OMM_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _classify_block(plane, muv, ccw_flag, *, size, size_log2, is_pow2, rcp,
                    W, H, addr_mode, alpha_cutoff, border_alpha, fz=None):
    """Level-line classify of a block of micro-tris (same math as
    kernels.jax_classify.block_fn)."""
    seed = _bilinear_seed(plane, muv[:, 0, :], size, size_log2, is_pow2,
                          addr_mode, border_alpha, fz)
    seed_above = jnp.float32(alpha_cutoff) < seed

    from ..kernels.levelline import guard as _gq
    rf = jnp.asarray(np.array(size, dtype=np.float32))
    q = _gq(jnp, muv * rf, fz) + jnp.float32(-0.5)
    qn = jnp.where(ccw_flag, q, q[:, ::-1, :])
    amin = qn.min(axis=-2)
    amax = qn.max(axis=-2)
    ix0 = jnp.floor(amin[:, 0]).astype(jnp.int32)
    iy0 = jnp.floor(amin[:, 1]).astype(jnp.int32)
    ix1 = jnp.ceil(amax[:, 0]).astype(jnp.int32)
    iy1 = jnp.ceil(amax[:, 1]).astype(jnp.int32)
    x = ix0[:, None, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    y = iy0[:, None, None] + jnp.arange(H, dtype=jnp.int32)[None, :, None]
    inb = (x < ix1[:, None, None]) & (y < iy1[:, None, None])
    B = muv.shape[0]
    x = jnp.broadcast_to(x, (B, H, W))
    y = jnp.broadcast_to(y, (B, H, W))
    mask = inb & conservative_raster_mask(jnp, qn, x, y, fz)

    a_inc, b_inc = level_line_texel_kernel(
        jnp, muv, make_tri_params(jnp, muv), x, y, plane, size, size_log2,
        is_pow2, rcp, addr_mode, alpha_cutoff, border_alpha, degenerate=False,
        fz=fz)
    zero = jnp.int32(0)
    above = jnp.where(mask, a_inc, zero).sum(axis=(-1, -2), dtype=jnp.int32)
    below = jnp.where(mask, b_inc, zero).sum(axis=(-1, -2), dtype=jnp.int32)
    return above + seed_above.astype(jnp.int32), below + (~seed_above).astype(jnp.int32)


def classify_item_sharded(mesh: Mesh, plane, uv_tri, ccw: bool, *, subdiv,
                          size, size_log2, is_pow2, rcp, W, H, addr_mode,
                          alpha_cutoff, border_alpha, fmt, promotion,
                          cutoff_gt, cutoff_le):
    """Classify one work item with the micro-triangle axis sharded over the
    mesh.  Returns (states (M,), histogram (4,)); the histogram is reduced
    with psum over ICI."""
    M = get_num_micro_triangles(subdiv)
    n_dev = mesh.devices.size
    assert M % n_dev == 0, "4^N must divide the mesh size"

    def shard_fn(idx_shard, uv_tri_rep, ccw_rep, plane_rep, fz):
        muv = bird.micro_triangle_uvs(uv_tri_rep, idx_shard, subdiv, xp=jnp,
                                      fz=fz)
        above, below = _classify_block(
            plane_rep, muv, ccw_rep, size=size, size_log2=size_log2,
            is_pow2=is_pow2, rcp=rcp, W=W, H=H, addr_mode=addr_mode,
            alpha_cutoff=alpha_cutoff, border_alpha=border_alpha, fz=fz)
        states = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                         cutoff_le, above, below)
        hist = jnp.zeros(4, jnp.int32).at[states].add(1)
        hist = jax.lax.psum(hist, OMM_AXIS)
        return states, hist

    idx = jnp.arange(M, dtype=jnp.uint32)
    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(OMM_AXIS), P(), P(), P(), P()),
        out_specs=(P(OMM_AXIS), P()),
    )
    fn = jax.jit(mapped)
    return fn(idx, jnp.asarray(uv_tri, jnp.float32), jnp.asarray(ccw), plane,
              jnp.int32(0))


def sharded_bake_step(mesh: Mesh, plane, uv_tris, ccws, *, subdiv, size,
                      size_log2, is_pow2, rcp, W, H, addr_mode, alpha_cutoff,
                      border_alpha, fmt, promotion, cutoff_gt, cutoff_le):
    """Full multi-item bake step, jitted over the mesh: classifies a batch
    of work items (T, 3, 2) with micro-tris sharded, producing per-item
    states and a global state histogram.  This is the dryrun_multichip
    entry's compiled step."""
    M = get_num_micro_triangles(subdiv)
    n_dev = mesh.devices.size
    assert M % n_dev == 0

    def shard_fn(idx_shard, uv_tris_rep, ccws_rep, plane_rep, fz):
        def one(uv_tri, ccw):
            muv = bird.micro_triangle_uvs(uv_tri, idx_shard, subdiv, xp=jnp,
                                          fz=fz)
            return _classify_block(
                plane_rep, muv, ccw, size=size, size_log2=size_log2,
                is_pow2=is_pow2, rcp=rcp, W=W, H=H, addr_mode=addr_mode,
                alpha_cutoff=alpha_cutoff, border_alpha=border_alpha, fz=fz)

        above, below = jax.vmap(one)(uv_tris_rep, ccws_rep)
        states = get_state_from_coverage(jnp, fmt, promotion, cutoff_gt,
                                         cutoff_le, above, below)
        hist = jnp.zeros(4, jnp.int32).at[states.reshape(-1)].add(1)
        hist = jax.lax.psum(hist, OMM_AXIS)
        return states, hist

    idx = jnp.arange(M, dtype=jnp.uint32)
    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(OMM_AXIS), P(), P(), P(), P()),
        out_specs=(P(None, OMM_AXIS), P()),
    )
    return jax.jit(mapped)(idx, jnp.asarray(uv_tris, jnp.float32),
                           jnp.asarray(ccws), plane, jnp.int32(0))


def sharded_classify_batch(mesh: Mesh, texture, cfg, items, subdiv: int,
                           max_attempts: int = 4):
    """FULL two-phase pipeline (kernels/twophase.py stages A-D: hierarchical
    descent, survivor compaction, exact Pallas kernel, 2-bit pack) under
    shard_map, with the WORK-ITEM axis split across the mesh — the
    reference's only scale axis (OpenMP over work items,
    bake_cpu_impl.cpp:735,833) done for ICI.  Class planes and halo tiles
    are replicated per chip; survivor counts and the global state histogram
    are psum-merged over ICI.

    Per-item results are bit-identical to the single-device engine
    (classify_work_items_batches): every pipeline stage is item-local, so
    shard composition cannot change any item's states.

    Requirements: len(items) divisible by the mesh size, all items
    fast-path eligible, all states UnknownOpaque (fresh bake).
    Returns (list of per-item (M,) uint8 state arrays, histogram (4,)).
    """
    from ..kernels import twophase as tp
    from ..types import OpacityState

    UO = int(OpacityState.UnknownOpaque)
    n_dev = mesh.devices.size
    T = len(items)
    if T % n_dev != 0:
        raise ValueError(f"item count {T} not divisible by mesh {n_dev}")
    M = get_num_micro_triangles(subdiv)
    lg = tp._group_level(texture, [uv for uv, _ in items], subdiv)
    for uv, st in items:
        if not (st == UO).all():
            raise ValueError("sharded_classify_batch requires fresh items")
        if not tp._fast_path_ok(texture, cfg, uv, subdiv, lg):
            raise ValueError("item not fast-path eligible")
        if not bool(geom.winding_stable(uv, subdiv)):
            # stage C normalizes with the macro winding (see
            # twophase._fast_path_mask); slivers take the host path
            raise ValueError("item winding-unstable for the fast path")
    ctx = tp._BatchCtx(texture, cfg, items, subdiv, list(range(T)),
                       [None] * T)
    levels = ctx.levels
    m = len(levels) - 1
    Tl = T // n_dev
    act_dummy = jnp.ones((1, 1), bool)

    def run_ab_meta(Cs, K_cap):
        def shard_fn(uv_shard, ccw_shard, fz):
            res = tp._stageAB(
                ctx.cls_tuple, uv_shard, act_dummy, fz,
                subdiv=subdiv, levels=levels, caps=tuple(Cs), K_cap=K_cap,
                mips=tuple(ctx.mips), pads=tuple(ctx.pads),
                ntxs=tuple(ctx.ntxs), all_active=True,
                periods=tuple(ctx.periods))
            return jax.lax.pmax(res[4], OMM_AXIS)
        return shard_map(shard_fn, mesh=mesh,
                         in_specs=(P(OMM_AXIS), P(OMM_AXIS), P()),
                         out_specs=P(),
                         check_vma=False)(ctx.uvJ, ctx.ccwJ, jnp.int32(0))

    # capacity discovery (per shard): same heuristic/retry as the
    # single-device sync path, flag pmax-merged across chips
    Cs = [max(tp._bucket(Tl * (2 ** levels[i]) * 8), 512) for i in range(m)]
    K_cap = max(tp._bucket(min(Tl * (2 ** subdiv) * 16, Tl * M)), 4 * tp.B)
    for _ in range(max_attempts):
        meta_np = np.asarray(run_ab_meta(Cs, K_cap))
        Cs_true = [int(meta_np[i]) for i in range(m)]
        K, flag = int(meta_np[m]), int(meta_np[m + 1])
        if flag == 0:
            break
        Cs = [max(c, tp._bucket(ct + ct // 8 + 64))
              for c, ct in zip(Cs, Cs_true)]
        K_cap = max(K_cap, tp._bucket(K + K // 8 + 64))
    else:
        raise RuntimeError("sharded capacity discovery did not converge")
    nblks = [max(tp._bucket((int(meta_np[m + 2 + mi]) + tp.B - 1) // tp.B), 8)
             for mi in range(len(ctx.mips))]

    def shard_fn(uv_shard, ccw_shard, fz):
        res = tp._stageAB(
            ctx.cls_tuple, uv_shard, act_dummy, fz,
            subdiv=subdiv, levels=levels, caps=tuple(Cs), K_cap=K_cap,
            mips=tuple(ctx.mips), pads=tuple(ctx.pads),
            ntxs=tuple(ctx.ntxs), all_active=True,
            periods=tuple(ctx.periods))
        sides, nodes, ids, kvalid, meta, slots = res
        mip_counts = []
        for mip, (w, h) in enumerate(ctx.mips):
            mip_counts.append(tp._stageC_mip(
                ctx.tilesEs[mip], uv_shard, ccw_shard, ids, kvalid,
                slots[mip][0], slots[mip][1], fz, subdiv=subdiv,
                K_cap=K_cap, nblk=nblks[mip], w=w, h=h, pad=ctx.pads[mip],
                ntx=ctx.ntxs[mip], H=ctx.HWu[mip][0], W=ctx.HWu[mip][1],
                rcp=ctx.rcps[mip],
                alpha_cutoff=float(cfg.alpha_cutoff),
                period=ctx.periods[mip],
                bf16x3=ctx.bf16oks[mip]))
        packed = tp._stageD(
            sides, nodes, ids, kvalid, tuple(mip_counts), subdiv=subdiv,
            levels=levels, fmt=cfg.fmt, promotion=cfg.promotion,
            cutoff_gt=cfg.cutoff_gt, cutoff_le=cfg.cutoff_le)
        survivors = jax.lax.psum(meta[m], OMM_AXIS)
        vals = jnp.stack([(packed >> (2 * k)) & 3 for k in range(4)])
        hist = jnp.stack([jnp.sum(vals == s, dtype=jnp.int32)
                          for s in range(4)])
        return packed, jax.lax.psum(hist, OMM_AXIS), survivors

    packed, hist, _ = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(OMM_AXIS), P(OMM_AXIS), P()),
        out_specs=(P(OMM_AXIS), P(), P()),
        check_vma=False)(ctx.uvJ, ctx.ccwJ, jnp.int32(0))
    packed_np = np.asarray(packed)
    out = [tp._unpack_states(packed_np[t], M) for t in range(T)]
    return out, np.asarray(hist)


def sharded_group_resolve(mesh: Mesh, cls_plane, uv_tris, *, subdiv, lg,
                          pad, size):
    """Hierarchical phase-1 group resolve sharded over the mesh (the
    multi-chip form of kernels.twophase stage A).

    The bird-curve GROUP axis is sharded: each chip tests its contiguous
    slice of subtriangle windows against the replicated min/max class
    plane (one int8 gather per group) and the per-side group counts are
    psum-reduced over ICI.  Returns (side (T, NG) sharded on the group
    axis, counts (3,) replicated: [above, below, mixed])."""
    from ..kernels.twophase import _bary_cols, _window_origin

    NG = 4 ** lg
    n_dev = mesh.devices.size
    assert NG % n_dev == 0, "4^lg must divide the mesh size"
    w, h = size

    def shard_fn(gidx_shard, uv_rep, cls_rep, fz):
        bu, bv, bd = _bary_cols(gidx_shard.astype(jnp.uint32), lg)
        tri6 = tuple(uv_rep[:, k:k + 1] for k in range(6))
        x0, y0 = _window_origin(tri6, bu[None, :], bv[None, :],
                                bd[None, :], w, h, fz)
        side = cls_rep[y0 - 1 + pad, x0 - 1 + pad]  # (T, NG/n_dev)
        counts = jnp.stack([
            jnp.sum(side == 1, dtype=jnp.int32),
            jnp.sum(side == -1, dtype=jnp.int32),
            jnp.sum(side == 0, dtype=jnp.int32)])
        return side, jax.lax.psum(counts, OMM_AXIS)

    gidx = jnp.arange(NG, dtype=jnp.uint32)
    uv_flat = jnp.asarray(np.asarray(uv_tris, np.float32)
                          .reshape(-1, 6))
    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(OMM_AXIS), P(), P(), P()),
        out_specs=(P(None, OMM_AXIS), P()),
    )
    return jax.jit(mapped)(gidx, uv_flat, cls_plane, jnp.int32(0))
