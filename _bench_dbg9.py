"""Benchmark: micro-triangle classification throughput on one chip.

Workload matches the driver baseline (BASELINE.md): subdivision level 9
(262144 micro-triangles per triangle) over a 1024x1024 alpha texture,
linear filter, level-line classification — with a bit-exactness check
against the numpy oracle before timing.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver target of 100M utri/s/chip.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET = 100e6  # utri/s/chip (BASELINE.md driver-set target)
SUBDIV = 9
N_TRIS = 8  # amortize launch overhead over a batch of work items


def main():
    import jax
    import jax.numpy as jnp

    import omm_tpu as omm
    from omm_tpu import engine, geom
    from omm_tpu.kernels.jax_classify import (_classify_item, _window_bounds)
    from omm_tpu.kernels.levelline import get_state_from_coverage

    # Foliage-like procedural alpha (circle + hex grid mix for irregular
    # coverage), fp32 1024^2.
    w = h = 1024
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    u = i / np.float32(w)
    v = j / np.float32(w)
    r = np.sqrt((u - 0.5) ** 2 + (v - 0.5) ** 2)
    plane = np.where(r < np.float32(0.4), np.float32(0.0),
                     np.float32(1.0)).astype(np.float32)
    plane[0, 0] = np.float32(0.6)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)

    rng = np.random.RandomState(42)
    uv_tris = []
    for _ in range(N_TRIS):
        base = rng.rand(2).astype(np.float32) * 0.2
        uv_tris.append(np.array([base + [0.05, 0.1], base + [0.1, 0.7],
                                 base + [0.7, 0.65]], dtype=np.float32))
    uv_tris = np.stack(uv_tris)

    cfg = engine.ResampleConfig(
        addr_mode=omm.TextureAddressMode.Clamp,
        filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
        border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)

    planes = (jnp.asarray(tex.load_plane(0)),)
    info = tex.info[0]
    mip_meta = ((info.size, info.size_log2, info.is_pow2,
                 (float(info.rcp_size[0]), float(info.rcp_size[1]))),)

    static = dict(subdiv=SUBDIV, addr_mode=cfg.addr_mode, alpha_cutoff=0.5,
                  border_alpha=0.0, mip_meta=mip_meta, fmt=cfg.fmt,
                  promotion=cfg.promotion, cutoff_gt=cfg.cutoff_gt,
                  cutoff_le=cfg.cutoff_le)

    # Per-triangle window bounds; use the max so one jit covers the batch.
    wins = [_window_bounds(tex, t, SUBDIV)[0] for t in uv_tris]
    win = ((max(w0 for w0, _ in wins), max(h0 for _, h0 in wins)),)
    ccws = [bool(geom.is_ccw(t)) for t in uv_tris]

    def run_all(verbose=False):
        import time as _t
        outs = []
        for t, c in zip(uv_tris, ccws):
            _t0 = _t.perf_counter()
            a, b = _classify_item(planes, jnp.asarray(t, jnp.float32),
                                  jnp.asarray(c), win_wh=win, **static)
            if verbose: print("  dispatch", round((_t.perf_counter()-_t0)*1e3,1), "ms", flush=True)
            outs.append((a, b))
        _t0 = _t.perf_counter()
        jax.block_until_ready(outs)
        if verbose: print("  block", round((_t.perf_counter()-_t0)*1e3,1), "ms", flush=True)
        return outs

    import time as _t
    print('pre-warmup', flush=True)
    _t0=_t.perf_counter()
    outs = run_all(verbose=True)
    print('warmup took', round(_t.perf_counter()-_t0,1), flush=True)

    # Parity gate: device states must match the numpy oracle on tri 0.
    M = omm.get_num_micro_triangles(SUBDIV)
    states0 = np.full(M, int(omm.OpacityState.UnknownOpaque), np.uint8)
    _t0=_t.perf_counter()
    oracle = engine.resample_fine_item(tex, cfg, uv_tris[0], SUBDIV, states0)
    print('oracle took', round(_t.perf_counter()-_t0,1), flush=True)
    a0 = np.asarray(outs[0][0])
    b0 = np.asarray(outs[0][1])
    got = np.asarray(get_state_from_coverage(
        np, cfg.fmt, cfg.promotion, cfg.cutoff_gt, cfg.cutoff_le, a0, b0),
        dtype=np.uint8)
    parity = bool((got == oracle).all())

    print('cache size pre:', _classify_item._cache_size(), flush=True)
    run_all(verbose=True)
    print('cache size post:', _classify_item._cache_size(), flush=True)
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = run_all()
    dt = (time.perf_counter() - t0) / reps
    rate = N_TRIS * M / dt

    print(json.dumps({
        "metric": "utri_classified_per_sec_per_chip_subdiv9",
        "value": round(rate, 1),
        "unit": "utri/s",
        "vs_baseline": round(rate / TARGET, 3),
        "bit_exact_vs_oracle": parity,
        "device": str(jax.devices()[0]),
    }))
    if not parity:
        sys.exit(1)


if __name__ == "__main__":
    main()
