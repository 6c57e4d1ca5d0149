"""Benchmark: micro-triangle classification throughput on one chip.

Workload matches the driver baseline (BASELINE.md): subdivision level 9
(262144 micro-triangles per triangle) over a 1024x1024 alpha texture,
linear filter, level-line classification.  The engine is the Pallas kernel
(kernels/pallas_classify.py — region DMA + one-hot-matmul window gather);
the bake schedule (bird-curve block regions) is host-precomputed once per
mesh and reused across repetitions, as a production baker reuses it across
textures.

Timing is synchronous: every repetition materializes a device->host value
so async-dispatch illusions (the tunnel acks enqueues before execution)
cannot inflate the number.  A bit-exactness gate against the numpy oracle
must pass before the result counts.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...};
vs_baseline is against the driver target of 100M utri/s/chip.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET = 100e6  # utri/s/chip (BASELINE.md driver-set target)
SUBDIV = 9
N_TRIS = 8


def main():
    import jax
    import jax.numpy as jnp

    import omm_tpu as omm
    from omm_tpu import engine, geom
    from omm_tpu.kernels import pallas_classify as pk

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

    cfg = engine.ResampleConfig(
        addr_mode=omm.TextureAddressMode.Clamp,
        filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
        border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)

    M = omm.get_num_micro_triangles(SUBDIV)

    # --- engine selection: pallas, else XLA-gather fallback -----------------
    engine_name = "pallas_onehot_mxu"
    runners = []
    try:
        jobs = [pk.prepare_jobs_v3(tex, cfg, t, SUBDIV) for t in uv_tris]
        assert all(jb is not None for jb in jobs)

        def make_runner(jb):
            def run():
                return pk.run_job_v3(jb[0])  # single mip
            return run

        runners = [make_runner(jb) for jb in jobs]
        a, b = runners[0]()
        _ = int(np.asarray(a).ravel()[0])  # force real compile+run
    except Exception:
        engine_name = "xla_gather_fallback"
        from omm_tpu.kernels.jax_classify import (_classify_item,
                                                  _window_bounds)
        info = tex.info[0]
        mip_meta = ((info.size, info.size_log2, info.is_pow2,
                     (float(info.rcp_size[0]), float(info.rcp_size[1]))),)
        planes_t = (jnp.asarray(tex.load_plane(0)),)
        static = dict(subdiv=SUBDIV, addr_mode=cfg.addr_mode,
                      alpha_cutoff=0.5, border_alpha=0.0, mip_meta=mip_meta,
                      fmt=cfg.fmt, promotion=cfg.promotion,
                      cutoff_gt=cfg.cutoff_gt, cutoff_le=cfg.cutoff_le)
        wins = [_window_bounds(tex, t, SUBDIV)[0] for t in uv_tris]
        win = ((max(w0 for w0, _ in wins), max(h0 for _, h0 in wins)),)

        def make_runner(t, c):
            def run():
                return _classify_item(planes_t, jnp.asarray(t, jnp.float32),
                                      jnp.asarray(c), win_wh=win, **static)
            return run

        runners = [make_runner(t, bool(geom.is_ccw(t))) for t in uv_tris]
        a, b = runners[0]()
        _ = int(np.asarray(a).ravel()[0])

    # Parity gate: device states vs numpy oracle on triangle 0.
    states0 = np.full(M, int(omm.OpacityState.UnknownOpaque), np.uint8)
    got = pk.classify_work_item_pallas(tex, cfg, uv_tris[0], SUBDIV,
                                       states0.copy())
    oracle = engine.resample_fine_item(tex, cfg, uv_tris[0], SUBDIV,
                                       states0.copy())
    parity = bool((got == oracle).all())

    # Warm all runners, drain the queue.
    for run in runners:
        a, b = run()
    _ = int(np.asarray(a).ravel()[0])

    reps = 5
    t0 = time.perf_counter()
    for _rep in range(reps):
        for run in runners:
            a, b = run()
        _ = int(np.asarray(a).ravel()[0]) + int(np.asarray(b).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    rate = N_TRIS * M / dt

    print(json.dumps({
        "metric": "utri_classified_per_sec_per_chip_subdiv9",
        "value": round(rate, 1),
        "unit": "utri/s",
        "vs_baseline": round(rate / TARGET, 3),
        "bit_exact_vs_oracle": parity,
        "engine": engine_name,
        "device": str(jax.devices()[0]),
    }))
    if not parity:
        sys.exit(1)


if __name__ == "__main__":
    main()
