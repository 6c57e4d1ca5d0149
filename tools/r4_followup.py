"""Round-4 chip follow-up: (a) headline-loop A/B of the sort-based vs
scatter-based compaction (separate processes — OMM_TP_SORT_COMPACT is
frozen at import), (b) an OMM_BAKE_TRACE'd e2e omm.bake attribution run.

Usage: python tools/r4_followup.py ab0|ab1|e2e
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_mod():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)
    return bm


def _cache_on():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def headline(reps=13):
    bm = _bench_mod()
    _cache_on()
    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp
    tex, uv_tris = bm._workload()
    cfg = bm._cfg(engine, omm)
    M = omm.get_num_micro_triangles(bm.SUBDIV)

    def one():
        return tp.classify_work_items_batches(
            tex, cfg, [[(t, None) for t in uv_tris[k:k + bm.BATCH]]
                       for k in range(0, bm.N_TRIS, bm.BATCH)], bm.SUBDIV)

    t0 = time.perf_counter()
    one()
    print("first(+compile) %.1f s" % (time.perf_counter() - t0), flush=True)
    for _ in range(4):
        one()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        one()
        ts.append(time.perf_counter() - t0)
    best, mean = min(ts), sum(ts) / len(ts)
    print("sort_compact=%s: best %.1f ms (%.0fM utri/s) mean %.1f ms "
          "reps %s" % (os.environ.get("OMM_TP_SORT_COMPACT", "1"),
                       best * 1e3, bm.N_TRIS * M / best / 1e6, mean * 1e3,
                       [round(t, 4) for t in ts]), flush=True)


def e2e():
    import numpy as np
    bm = _bench_mod()
    _cache_on()
    import omm_tpu as omm
    os.environ["OMM_BAKE_SUBBATCH"] = str(bm.BATCH)
    tex, uv_tris = bm._workload()
    tc = np.concatenate(uv_tris).astype(np.float32)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=tc,
        index_buffer=np.arange(3 * bm.N_TRIS, dtype=np.uint32),
        index_count=3 * bm.N_TRIS, alpha_cutoff=0.5,
        max_subdivision_level=bm.SUBDIV, dynamic_subdivision_scale=0.0)
    M = omm.get_num_micro_triangles(bm.SUBDIV)
    t0 = time.perf_counter()
    omm.bake(desc, backend="pallas")
    print("first(+compile) %.1f s" % (time.perf_counter() - t0), flush=True)
    for _ in range(3):
        omm.bake(desc, backend="pallas")
    os.environ["OMM_BAKE_TRACE"] = "1"
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        omm.bake(desc, backend="pallas")
        dt = time.perf_counter() - t0
        ts.append(dt)
        print("e2e rep %.1f ms" % (dt * 1e3), flush=True)
    best = min(ts)
    print("e2e best %.1f ms (%.0fM utri/s)" %
          (best * 1e3, bm.N_TRIS * M / best / 1e6), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "e2e"
    if mode == "ab0":
        os.environ["OMM_TP_SORT_COMPACT"] = "0"
        headline()
    elif mode == "ab1":
        os.environ["OMM_TP_SORT_COMPACT"] = "1"
        headline()
    elif mode == "tail1":
        os.environ["OMM_TP_TAIL_STEP1"] = "1"
        headline()
    elif mode == "flat1":
        os.environ["OMM_TP_FLAT_GATHER"] = "1"
        headline()
    else:
        e2e()
