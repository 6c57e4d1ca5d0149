"""Round-5 session-3 chip follow-up.

Warms + measures, in order (each step prints as it lands so a wedge
keeps earlier results):
  1. default engine, bf16x3 split ON (the new exact-gather matmul) —
     bench-style best-of-N on the 256-tri subdiv-9 driver workload;
  2. same workload with the split gated OFF (fp32 HIGHEST matmul, the
     round-4 kernel) for a same-window A/B;
  3. the ComputeOnly engine spot (now the full two-phase pipeline with
     the XLA exact stage) via bench._spot_computeonly, parity included.

Timing discipline: every rep materializes the fetched payload host-side
(classify_work_items_batches returns reconstructed rows), so the tunnel
cannot fake async completion (CLAUDE.md timing rule).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_tpu")

import bench as bm  # noqa: E402
import omm_tpu as omm  # noqa: E402
from omm_tpu import engine  # noqa: E402
from omm_tpu.kernels import pallas_classify as pk  # noqa: E402
from omm_tpu.kernels import twophase as tp  # noqa: E402

SUBDIV = bm.SUBDIV
M = omm.get_num_micro_triangles(SUBDIV)


def timeit(label, tex, cfg, uv_tris, n=8, warm=2):
    def run_once():
        items = [[(t, None) for t in uv_tris[k:k + 128]]
                 for k in range(0, len(uv_tris), 128)]
        t0 = time.perf_counter()
        tp.classify_work_items_batches(tex, cfg, items, SUBDIV,
                                       packed_out=True)
        return time.perf_counter() - t0

    for _ in range(warm):
        run_once()
    times = [run_once() for _ in range(n)]
    best = min(times)
    rate = len(uv_tris) * M / best
    print(f"{label}: best {best * 1e3:.1f} ms ({rate / 1e6:.1f}M utri/s)"
          f"  times={[round(t * 1e3, 1) for t in times]}", flush=True)
    return best


def parity_check(tex, cfg, uv_tris, n=8):
    """Bit-exactness spot vs the per-item oracle on n triangles."""
    got = tp.classify_work_items_batches(
        tex, cfg, [[(t, None) for t in uv_tris[:n]]], SUBDIV)[0]
    for t, st in zip(uv_tris[:n], got):
        want = engine.resample_fine_item(
            tex, cfg, t, SUBDIV, np.full(M, 3, np.uint8))
        if not np.array_equal(st, want):
            return False
    return True


def main():
    t_start = time.time()
    tex, uv_tris = bm._workload()
    cfg = bm._cfg(engine, omm)

    print(f"[{time.time() - t_start:.0f}s] step 1: bf16x3 ON", flush=True)
    b_on = timeit("bf16x3 ON ", tex, cfg, uv_tris, n=8, warm=3)
    print("parity(8):", parity_check(tex, cfg, uv_tris), flush=True)

    print(f"[{time.time() - t_start:.0f}s] step 2: bf16x3 OFF (A/B)",
          flush=True)
    orig_safe = pk.bf16x3_safe
    pk.bf16x3_safe = lambda plane: False
    try:
        tex_off, _ = bm._workload()  # fresh texture -> fresh plane caches
        b_off = timeit("bf16x3 OFF", tex_off, cfg, uv_tris, n=8, warm=3)
    finally:
        pk.bf16x3_safe = orig_safe
    print(f"A/B: ON {256 * M / b_on / 1e6:.1f}M vs OFF "
          f"{256 * M / b_off / 1e6:.1f}M  (speedup {b_off / b_on:.3f}x)",
          flush=True)

    print(f"[{time.time() - t_start:.0f}s] step 3: ComputeOnly v2 spot",
          flush=True)
    rate, ok = bm._spot_computeonly(tex, uv_tris)
    print(f"computeonly: {rate / 1e6:.1f}M utri/s  bit_exact={ok}",
          flush=True)
    print(f"[{time.time() - t_start:.0f}s] done", flush=True)


if __name__ == "__main__":
    main()
