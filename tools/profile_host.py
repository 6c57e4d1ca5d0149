"""Host-side cost attribution for classify_work_items_batches.

Runs the bench workload on the forced-CPU backend and reports (a) the
OMM_TP_TRACE host marks and (b) a cProfile of the steady-state call,
filtered to host-side code.  Device timings are meaningless here (the
"device" is the same cores) — this tool is for the HOST half of the
pipeline, which on a tunnel-attached chip is the wall-clock bound
(STATUS.md: best rep 130 ms wall vs 59 ms device).
"""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

os.environ.setdefault("OMM_TP_TRACE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402
import omm_tpu as omm  # noqa: E402
from omm_tpu import engine  # noqa: E402
from omm_tpu.kernels import twophase as tp  # noqa: E402


def main():
    tex, uv_tris = bench._workload()
    cfg = bench._cfg(engine, omm)

    def batches():
        return [[(t, None) for t in uv_tris[k:k + bench.BATCH]]
                for k in range(0, bench.N_TRIS, bench.BATCH)]

    print("warmup (compiles; cold can take minutes on CPU)...")
    t0 = time.perf_counter()
    tp.classify_work_items_batches(tex, cfg, batches(), bench.SUBDIV)
    print(f"warmup1 {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    tp.classify_work_items_batches(tex, cfg, batches(), bench.SUBDIV)
    print(f"warmup2 {time.perf_counter() - t0:.1f}s")

    tp.TRACE.clear()
    t0 = time.perf_counter()
    tp.classify_work_items_batches(tex, cfg, batches(), bench.SUBDIV)
    wall = time.perf_counter() - t0
    print(f"steady wall {wall * 1e3:.1f} ms")
    prev = 0.0
    for lab, t in tp.TRACE:
        print(f"  {lab:12s} +{(t - prev) * 1e3:7.2f} ms  (t={t * 1e3:7.2f})")
        prev = t

    pr = cProfile.Profile()
    pr.enable()
    tp.classify_work_items_batches(tex, cfg, batches(), bench.SUBDIV)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    print("\n--- cumulative (top 40) ---")
    st.print_stats(40)


if __name__ == "__main__":
    main()
