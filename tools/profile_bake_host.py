"""Host-side cost attribution for the bake()'s POST-classification tail.

bench.py r3s2: classification is ~112 ms/rep but a full omm.bake of the
same workload is ~583 ms — the difference is the host-only pipeline
around it (dedup passes, LSH merge, promotion, compress, histograms,
morton sort, bit-pack + index emission).  This tool builds the bench
workload, classifies it ONCE with the numpy oracle (threaded), then
times each post-classification stage on fresh deep copies so no stage
benefits from a previous run's merges.

Pure-host: forces the CPU jax backend and never touches the tunnel.
"""
from __future__ import annotations

import copy
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402
import omm_tpu as omm  # noqa: E402
from importlib import import_module  # noqa: E402

bk = import_module("omm_tpu.bake")  # the bake() function shadows the module
from omm_tpu import engine  # noqa: E402
from omm_tpu.types import BakeFlags  # noqa: E402


def main():
    tex, uv_tris = bench._workload()
    tc = np.concatenate(uv_tris).astype(np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.arange(3 * bench.N_TRIS, dtype=np.uint32),
        index_count=3 * bench.N_TRIS, alpha_cutoff=0.5,
        max_subdivision_level=bench.SUBDIV, dynamic_subdivision_scale=0.0,
        bake_flags=int(BakeFlags.EnableInternalThreads))
    opts = bk.Options.from_flags(desc.bake_flags)
    from omm_tpu.log import Logger
    log = Logger()

    t0 = time.perf_counter()
    items = bk.setup_work_items(desc, opts, log)
    print(f"setup_work_items      {1e3 * (time.perf_counter() - t0):8.1f} ms"
          f"  ({len(items)} items)")

    cfg = engine.ResampleConfig(
        addr_mode=desc.runtime_sampler.addressing_mode,
        filter=desc.runtime_sampler.filter, alpha_cutoff=desc.alpha_cutoff,
        border_alpha=desc.runtime_sampler.border_alpha, fmt=desc.format,
        promotion=desc.unknown_state_promotion,
        cutoff_gt=desc.alpha_cutoff_greater,
        cutoff_le=desc.alpha_cutoff_less_equal)

    t0 = time.perf_counter()
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(max_workers=min(os.cpu_count() or 4,
                                               16)) as pool:
        def _cls(it):
            st = engine.resample_coarse_item(tex, cfg, it.uv_tri,
                                             it.subdivision_level, it.states)
            return engine.resample_fine_item(tex, cfg, it.uv_tri,
                                             it.subdivision_level, st)
        for it, st in zip(items, pool.map(_cls, items)):
            it.states = st
    print(f"classify (numpy, 16t) {1e3 * (time.perf_counter() - t0):8.1f} ms")

    def stage(name, fn, its):
        t0 = time.perf_counter()
        out = fn(its)
        dt = time.perf_counter() - t0
        print(f"{name:22s}{1e3 * dt:8.1f} ms  ({len(its)} items)")
        return out

    # run the REAL stage order once, timing each in place
    its = items
    stage("promote1", lambda x: bk.promote_special_indices(desc, opts, x),
          its)
    stage("dedup_exact1", lambda x: bk.deduplicate_exact(opts, x), its)
    stage("lsh", lambda x: bk.deduplicate_similar_lsh(desc, opts, x,
                                                      iterations=3), its)
    stage("brute_force", lambda x: bk.deduplicate_similar_brute_force(
        opts, x), its)
    stage("promote2", lambda x: bk.promote_special_indices(desc, opts, x),
          its)
    stage("compress", lambda x: bk.compress(desc, opts, x), its)
    stage("dedup_exact2", lambda x: bk.deduplicate_exact(opts, x), its)
    stage("promote3", lambda x: bk.promote_special_indices(desc, opts, x),
          its)
    hists = stage("histograms",
                  lambda x: bk.create_usage_histograms(x), its)
    order = stage("morton_sort", lambda x: bk.micromap_spatial_sort(x), its)
    stage("serialize_result",
          lambda x: bk.serialize_result(desc, x, hists[0], hists[1], order),
          its)

    # cProfile of a full bake tail on a fresh classified copy
    import cProfile
    import pstats
    its2 = copy.deepcopy(items)
    # (items already merged in place above; rebuild from scratch states)
    pr = cProfile.Profile()
    pr.enable()
    bk.promote_special_indices(desc, opts, its2)
    bk.deduplicate_exact(opts, its2)
    bk.deduplicate_similar_lsh(desc, opts, its2, iterations=3)
    bk.deduplicate_similar_brute_force(opts, its2)
    bk.promote_special_indices(desc, opts, its2)
    bk.compress(desc, opts, its2)
    bk.deduplicate_exact(opts, its2)
    bk.promote_special_indices(desc, opts, its2)
    h = bk.create_usage_histograms(its2)
    o = bk.micromap_spatial_sort(its2)
    bk.serialize_result(desc, its2, h[0], h[1], o)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    print("\n--- cumulative (top 30) ---")
    st.print_stats(30)


if __name__ == "__main__":
    main()
