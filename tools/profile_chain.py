"""Profile the two-phase pipeline on the attached chip and summarize the
DEVICE timeline (jax.profiler Chrome trace): per-op durations, and the
idle gaps between consecutive device ops — the tunnel's per-dispatch
overhead shows up as gaps, which wall clocks can't attribute.

Usage: python tools/profile_chain.py [reps]
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(reps=2):
    import numpy as np
    import jax
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)
    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp

    tex, uv_tris = bm._workload()
    cfg = bm._cfg(engine, omm)

    def fresh_batches():
        return [[(t, None) for t in uv_tris[k:k + bm.BATCH]]
                for k in range(0, bm.N_TRIS, bm.BATCH)]

    def one():
        return tp.classify_work_items_batches(tex, cfg, fresh_batches(),
                                              bm.SUBDIV)

    for _ in range(5):
        one()

    # fetch-chunk sweep (env read per call; all jit signatures identical
    # so the sweep shares this process's compiles): best + mean of N
    M = omm.get_num_micro_triangles(bm.SUBDIV)
    for nch in (1, 2, 4):
        os.environ["OMM_TP_FETCH_CHUNKS"] = str(nch)
        one()  # settle
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            one()
            ts.append(time.perf_counter() - t0)
        best, mean = min(ts), sum(ts) / len(ts)
        print("chunks=%d: best %.1f ms (%.0fM utri/s)  mean %.1f ms" %
              (nch, best * 1e3, bm.N_TRIS * M / best / 1e6, mean * 1e3))
    os.environ["OMM_TP_FETCH_CHUNKS"] = "2"

    # enqueue-thread A/B (env read per call; no recompiles)
    for th in ("0", "1"):
        os.environ["OMM_TP_ENQUEUE_THREAD"] = th
        one()  # settle
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            one()
            ts.append(time.perf_counter() - t0)
        best, mean = min(ts), sum(ts) / len(ts)
        print("enqueue_thread=%s: best %.1f ms (%.0fM utri/s)  mean %.1f ms"
              % (th, best * 1e3, bm.N_TRIS * M / best / 1e6, mean * 1e3))
    os.environ.pop("OMM_TP_ENQUEUE_THREAD", None)

    # mega-chain A/B (one fused dispatch per rep vs the chunked
    # pipeline; ONE extra remote compile for the fused program)
    if os.environ.get("OMM_PROF_MEGACHAIN", "1") != "0":
        os.environ["OMM_TP_MEGACHAIN"] = "1"
        t0 = time.perf_counter()
        one()  # cold caps -> per-batch; second call compiles the fused
        one()
        print("megachain: first+compile %.1f s"
              % (time.perf_counter() - t0))
        one()  # settle
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            one()
            ts.append(time.perf_counter() - t0)
        best, mean = min(ts), sum(ts) / len(ts)
        print("megachain=1: best %.1f ms (%.0fM utri/s)  mean %.1f ms"
              % (best * 1e3, bm.N_TRIS * M / best / 1e6, mean * 1e3))
        os.environ.pop("OMM_TP_MEGACHAIN", None)

    # optional sub-batch sweep (OMM_PROF_SUBBATCH="64,128"): each size is
    # a NEW jit signature (T changes) — budget a remote compile per value
    for sb in filter(None, os.environ.get("OMM_PROF_SUBBATCH",
                                          "").split(",")):
        sb = int(sb)
        sb_batches = [[(t, None) for t in uv_tris[k:k + sb]]
                      for k in range(0, bm.N_TRIS, sb)]
        t0 = time.perf_counter()
        tp.classify_work_items_batches(tex, cfg, sb_batches, bm.SUBDIV)
        print("sub-batch %d: first(+compile) %.1f s" %
              (sb, time.perf_counter() - t0))
        for _ in range(2):
            tp.classify_work_items_batches(tex, cfg, sb_batches, bm.SUBDIV)
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            tp.classify_work_items_batches(tex, cfg, sb_batches, bm.SUBDIV)
            ts.append(time.perf_counter() - t0)
        best, mean = min(ts), sum(ts) / len(ts)
        print("sub-batch %d: best %.1f ms (%.0fM utri/s)  mean %.1f ms" %
              (sb, best * 1e3, bm.N_TRIS * M / best / 1e6, mean * 1e3))

    log = "/tmp/jaxtrace"
    os.system(f"rm -rf {log}")
    with jax.profiler.trace(log):
        for _ in range(reps):
            t0 = time.perf_counter()
            one()
            print("rep %.1f ms" % ((time.perf_counter() - t0) * 1000))
    # host timeline: the same call once more with OMM_TP_TRACE marks
    # (ctxN = batch prep done, enqN = dispatch issued, concat_enq = all
    # fetches issued, fetchN/reconN = chunk N synced / reconstructed)
    os.environ["OMM_TP_TRACE"] = "1"  # read per call; no reload needed
    for _ in range(3):
        tp.TRACE.clear()
        t0 = time.perf_counter()
        tp.classify_work_items_batches(tex, cfg, fresh_batches(), bm.SUBDIV)
        wall = (time.perf_counter() - t0) * 1000
        print("host marks (wall %.1f ms):" % wall,
              " ".join("%s@%.1f" % (lab, t * 1000) for lab, t in tp.TRACE))
    return log


def summarize(log, top=28):
    paths = sorted(glob.glob(log + "/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {log}"
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # device pid: process named like /device:TPU:* or 'TPU core'
    names = {e.get("pid"): e["args"].get("name", "")
             for e in ev if e.get("ph") == "M"
             and e.get("name") == "process_name"}
    dev_pids = [p for p, n in names.items()
                if "TPU" in n or "device" in n.lower()]
    print("processes:", names)
    for pid in dev_pids:
        ops = [e for e in ev if e.get("ph") == "X" and e.get("pid") == pid]
        if not ops:
            continue
        ops.sort(key=lambda e: e["ts"])
        t0, t1 = ops[0]["ts"], max(e["ts"] + e.get("dur", 0) for e in ops)
        # per-name totals
        tot = {}
        for e in ops:
            tot[e["name"]] = tot.get(e["name"], 0) + e.get("dur", 0)
        busy = sum(e.get("dur", 0) for e in ops)
        print(f"\n== pid {pid} ({names[pid]}): span {(t1-t0)/1e3:.1f} ms, "
              f"busy {busy/1e3:.1f} ms, idle {(t1-t0-busy)/1e3:.1f} ms")
        for n, d in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {d/1e3:8.2f} ms  {n[:100]}")
        # top gaps between consecutive ops (same pid, top-level lane 0?)
        # merge intervals to find true idle windows
        iv = sorted((e["ts"], e["ts"] + e.get("dur", 0)) for e in ops)
        merged = []
        for s, e2 in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e2)
            else:
                merged.append([s, e2])
        gaps = [(merged[i + 1][0] - merged[i][1], merged[i][1] - t0)
                for i in range(len(merged) - 1)]
        gaps.sort(reverse=True)
        print("  top idle gaps (ms, at-ms):",
              [(round(g / 1e3, 2), round(at / 1e3, 1))
               for g, at in gaps[:12]])


if __name__ == "__main__":
    log = run(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
    summarize(log)
