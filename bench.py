"""Benchmark: micro-triangle classification throughput on one chip.

Workload matches the driver baseline (BASELINE.md): subdivision level 9
(262144 micro-triangles per triangle) over a 1024x1024 alpha texture,
linear filter, level-line classification, for a 256-triangle mesh batch —
the production shape (one texture, many primitives).

Engine: the hierarchical two-phase classifier (kernels/twophase.py) —
bird-curve groups resolved against min/max-filtered class planes, contour
micro-triangles window-tested, true survivors through the exact
level-line Pallas kernel — measured END TO END per batch: device
pipeline, both host syncs, schedule/bucket logic, and the fetch of the
2-bit-packed states.

Bit-exactness gates (all must pass for the result to count):
  - the ENTIRE 256-triangle workload vs the numpy oracle (one full
    oracle pass per run, outside the timed loop — the reference's
    stats-equality discipline, test_omm_bake_cpu.cpp:105-114);
  - a multi-mip (3-level) real-chip spot at subdiv 6;
  - a nearest-filter real-chip spot (device phase-1 + exact host pass).

Perf spots beyond the headline (each with its own parity check, each
skipped gracefully when the device-time budget runs out — budgets count
from the FIRST device op, so probe retries can never starve them):
wrapped multi-repeat UVs, 1024-tri sustained, subdiv-11 (4.2M µtri/tri,
the CS-path scale class — omm.h:436-440), UNORM8 texture, mixed
per-triangle subdivision levels through the public omm.bake.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...};
vs_baseline is against the driver target of 100M utri/s/chip.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET = 100e6  # utri/s/chip (BASELINE.md driver-set target)
SUBDIV = 9
N_TRIS = 256
BATCH = 128  # pipelined sub-batches: fetches overlap later batches' compute
# (round-3 sweep on v5e: 128 beats 64 best AND mean — half the
# dispatch+fetch cycles halves the exposure to the tunnel's fixed
# ~26.5 ms/cycle cost: 124.2 ms best / 129.0 mean vs 126/146+ at 64;
# 256 regresses to 151.5 best — the single chain loses all
# fetch/compute overlap.  Round-2 landscape at 64: beat 32/48/96.)


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


def _cfg(engine, omm, **over):
    base = dict(addr_mode=omm.TextureAddressMode.Clamp,
                filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
                border_alpha=0.0, fmt=omm.Format.OC1_4_State,
                promotion=omm.UnknownStatePromotion.Nearest,
                cutoff_gt=omm.OpacityState.Opaque,
                cutoff_le=omm.OpacityState.Transparent)
    base.update(over)
    return engine.ResampleConfig(**base)


def _spot_multimip():
    """3-mip chain at subdiv 6 through the production two-phase engine on
    the attached chip vs the numpy oracle (exercises the per-mip exact
    kernel launches + early-unknown-exit accumulation)."""
    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp

    rng = np.random.RandomState(5)
    mips = []
    w = 128
    base = rng.rand(w, w).astype(np.float32)
    while w >= 32:
        mips.append(base[:w, :w].copy())
        w //= 2
    tex = omm.Texture(mips, omm.TextureFormat.FP32)
    cfg = _cfg(engine, omm)
    subdiv = 6
    M = omm.get_num_micro_triangles(subdiv)
    tris = [np.array([[0.1, 0.12], [0.2, 0.8], [0.82, 0.7]], np.float32),
            np.array([[0.3, 0.05], [0.35, 0.6], [0.9, 0.5]], np.float32)]
    items = [(t, np.full(M, 3, np.uint8)) for t in tris]
    got = tp.classify_work_items_batch(tex, cfg, items, subdiv)
    for t, st in zip(tris, got):
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        if not (st == want).all():
            return False
    return True


def _spot_nearest():
    """Nearest-filter production path (device phase-1 window resolve +
    exact host pass on the contour) vs the numpy oracle."""
    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp

    w = h = 256
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    plane = np.where(np.hypot(i - 128, j - 128) < np.float32(90),
                     np.float32(0.0), np.float32(1.0)).astype(np.float32)
    tex = omm.Texture([plane], omm.TextureFormat.FP32)
    cfg = _cfg(engine, omm, filter=omm.TextureFilterMode.Nearest)
    subdiv = 6
    M = omm.get_num_micro_triangles(subdiv)
    tris = [np.array([[0.1, 0.1], [0.15, 0.9], [0.9, 0.85]], np.float32)]
    items = [(t, np.full(M, 3, np.uint8)) for t in tris]
    res = tp.resolve_nearest_phase1(tex, cfg, items, subdiv)
    if res is None:
        return False
    for t, st in zip(tris, res):
        st = engine.resample_fine_item(tex, cfg, t, subdiv, st)
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        if not (st == want).all():
            return False
    return True


_T_DEV = None  # set when the device probe first succeeds


def _dev_elapsed() -> float:
    """Seconds since the device became reachable (inf before that).

    Spot budgets count from HERE, not process start: round-3 lesson —
    probe retries during a tunnel outage consumed the wrapped spot's
    budget, so the round's headline feature shipped with a null number.
    """
    return time.monotonic() - _T_DEV if _T_DEV is not None else float("inf")


def _await_device(max_wait_s=None):
    """Wait for the TPU tunnel to come up before touching it in-process.

    Backend init happens in a SUBPROCESS first: a wedged tunnel can hang
    the initializing call indefinitely (not fail fast), and a hang inside
    this process would eat the whole bench timeout.  Probe with a
    per-attempt timeout and retry — transient tunnel outages (tenant
    churn, terminal restarts) otherwise zero the headline number.

    The TOTAL budget must come in well under the driver's capture window
    (round-2 lesson: a 1800s budget outlived the window, so a down tunnel
    produced rc=124 with NO JSON instead of the structured error line).
    Default 540s, overridable via OMM_BENCH_PROBE_BUDGET; each attempt's
    timeout is clipped to the remaining budget so the error JSON is
    emitted the moment the deadline passes — never after one more retry.
    """
    import subprocess

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("OMM_BENCH_PROBE_BUDGET", "540"))
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    err = ["no probe attempted"]
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        attempt += 1
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True,
                timeout=max(5.0, min(300.0, remaining)))
            if p.returncode == 0:
                platform = p.stdout.strip().splitlines()[-1]
                if platform != "cpu" or os.environ.get(
                        "OMM_BENCH_ALLOW_CPU"):
                    global _T_DEV
                    _T_DEV = time.monotonic()
                    return True
                # a soft tunnel failure can fall back to the host CPU —
                # timing that would publish a bogus headline
                err = [f"backend fell back to '{platform}'"]
            else:
                err = p.stderr.strip().splitlines()[-1:] or ["?"]
        except subprocess.TimeoutExpired:
            err = ["probe hung past its timeout"]
        print(f"bench: device probe {attempt} failed: {err[0][:160]}",
              file=sys.stderr)
        if time.monotonic() + 30 > deadline:
            break
        time.sleep(30)
    print(json.dumps({
        "metric": "utri_classified_per_sec_per_chip_subdiv9",
        "value": 0.0, "unit": "utri/s", "vs_baseline": 0.0,
        "error": "device backend unavailable "
                 f"after {max_wait_s:.0f}s: {err[0][:200]}"}))
    return False


def _spot_wrapped(tex, uv_tris, cfg_base):
    """Wrapped multi-repeat UVs through the SAME two-phase engine (the
    workload class the reference handles via GPU samplers + its
    11x-scaled viewport, bake_gpu_impl.cpp:716-723; here period planes +
    modular anchors).  Returns (rate, parity_ok): best-of-N throughput on
    a 64-tri sub-batch of 3x-scaled Wrap UVs, with an 8-tri oracle spot."""
    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp

    cfg = _cfg(engine, omm, addr_mode=omm.TextureAddressMode.Wrap)
    M = omm.get_num_micro_triangles(SUBDIV)
    wtris = [t * np.float32(3.0) + np.float32(1.0) for t in uv_tris[:64]]
    lg = tp._group_level(tex, wtris, SUBDIV)
    if not tp._fast_path_mask(tex, cfg, np.stack(wtris), SUBDIV, lg).all():
        return None, False
    packed = os.environ.get("OMM_BENCH_PACKED", "1") != "0"

    def run():
        # two pipelined sub-batches: a single batch is one bare
        # dispatch+fetch with nothing to overlap the link tail
        outs = tp.classify_work_items_batches(
            tex, cfg, [[(t, None) for t in wtris[:32]],
                       [(t, None) for t in wtris[32:]]], SUBDIV,
            packed_out=packed)
        return [st for b in outs for st in b]

    got = run()  # compile + caps
    got = run()
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        got = run()
        times.append(time.perf_counter() - t0)
    parity = all(
        ((got[k].unpack() if isinstance(got[k], tp.PackedStates)
          else got[k]) == engine.resample_fine_item(
            tex, cfg, wtris[k], SUBDIV, np.full(M, 3, np.uint8))).all()
        for k in range(8))
    return len(wtris) * M / min(times), parity


def _spot_large_mesh(tex, uv_tris, cfg):
    """Sustained-throughput spot: ONE pipelined call over a 1024-triangle
    mesh (the reference's GPU baker batches tens of thousands of
    primitives per dispatch chain, integration_guide.md:669-675).  The
    8 sub-batches reuse the headline's warm T=128 jit signature; payload
    fetches chunk at NB/2 so reconstruction streams behind compute and
    the fixed link tail amortizes over 4x the work.  Returns
    (rate, parity_ok): best-of-5 utri/s + an 8-tri oracle parity spot."""
    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp

    M = omm.get_num_micro_triangles(SUBDIV)
    tris = [uv_tris[k % N_TRIS] for k in range(1024)]
    packed = os.environ.get("OMM_BENCH_PACKED", "1") != "0"
    prev = os.environ.get("OMM_TP_FETCH_CHUNKS")
    os.environ["OMM_TP_FETCH_CHUNKS"] = "4"
    try:
        def run():
            batches = [[(t, None) for t in tris[k:k + BATCH]]
                       for k in range(0, len(tris), BATCH)]
            return [st for b in tp.classify_work_items_batches(
                tex, cfg, batches, SUBDIV, packed_out=packed) for st in b]

        got = run()
        got = run()
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            got = run()
            times.append(time.perf_counter() - t0)
    finally:
        if prev is None:
            os.environ.pop("OMM_TP_FETCH_CHUNKS", None)
        else:
            os.environ["OMM_TP_FETCH_CHUNKS"] = prev
    UO = int(omm.OpacityState.UnknownOpaque)
    parity = all(
        ((got[k].unpack() if isinstance(got[k], tp.PackedStates)
          else got[k]) == engine.resample_fine_item(
            tex, cfg, tris[k], SUBDIV, np.full(M, UO, np.uint8))).all()
        for k in range(0, 1024, 128))
    return len(tris) * M / min(times), parity


def _spot_highsubdiv(tex, cfg):
    """Subdiv-11 spot: 4 triangles at 4.2M µtri each (16.7M total) — the
    compute-shader path's scale class (reference allows 12, omm.h:436-440
    + bake_gpu_impl.cpp:253-267; the HW-raster path stops at 9).  Two
    pipelined 2-item sub-batches so the fixed link round-trip overlaps
    device work like every production shape (a single 1-item batch is
    two bare syncs — it measures the tunnel, not the engine).  Full
    bit-exact parity vs the numpy oracle on one triangle.  Returns
    (rate, parity_ok)."""
    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp

    sub = 11
    M = omm.get_num_micro_triangles(sub)
    base = np.array([[0.05, 0.1], [0.1, 0.8], [0.75, 0.7]], np.float32)
    tris = [base + np.float32(0.02) * k for k in range(4)]

    def run():
        outs = tp.classify_work_items_batches(
            tex, cfg, [[(t, None) for t in tris[:2]],
                       [(t, None) for t in tris[2:]]], sub)
        return [st for b in outs for st in b]

    got = run()  # compile + caps
    got = run()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        got = run()
        times.append(time.perf_counter() - t0)
    want = engine.resample_fine_item(tex, cfg, tris[0], sub,
                                     np.full(M, 3, np.uint8))
    return 4 * M / min(times), bool((got[0] == want).all())


def _spot_unorm8(uv_tris, cfg_base):
    """UNORM8 spot: a 1024² uint8 alpha texture with a soft (dithered)
    contour through the production engine — exercises the UNORM8 decode
    (v * 1/255) on the device fast path at the headline's scale.  Returns
    (rate, parity_ok): best-of-N on one 128-tri sub-batch + an 8-tri
    oracle parity spot."""
    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp

    w = h = 1024
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    r = np.hypot(i / w - 0.5, j / h - 0.5)
    # soft radial edge quantized to uint8: a wide band of near-cutoff
    # values (the hard case for the window shortcut)
    a = np.clip((np.float32(0.45) - r) / np.float32(0.08), 0.0, 1.0)
    tex = omm.Texture([np.round(a * 255).astype(np.uint8)],
                      omm.TextureFormat.UNORM8)
    M = omm.get_num_micro_triangles(SUBDIV)
    tris = uv_tris[:BATCH]

    def run():
        return tp.classify_work_items_batches(
            tex, cfg_base, [[(t, None) for t in tris]], SUBDIV)[0]

    got = run()
    got = run()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        got = run()
        times.append(time.perf_counter() - t0)
    parity = all(
        (got[k] == engine.resample_fine_item(
            tex, cfg_base, tris[k], SUBDIV, np.full(M, 3, np.uint8))).all()
        for k in range(8))
    return len(tris) * M / min(times), parity


def _results_equal(a, b) -> bool:
    """Full BakeResult equality: bytes, descs, histograms, indices."""
    if (a.array_data != b.array_data).any():
        return False
    if a.desc_array != b.desc_array or a.index_format != b.index_format:
        return False
    if a.desc_array_histogram != b.desc_array_histogram:
        return False
    return (a.index_buffer == b.index_buffer).all()


def _spot_mixed_levels(tex, uv_tris):
    """Mixed per-triangle subdivision levels (7/8/9) through the PUBLIC
    omm.bake — the per-level grouping + sub-batching path the reference
    drives via per-level indirect dispatches (bake_gpu_impl.cpp:992-996).
    Returns (rate, parity_ok): best-of-3 e2e bake throughput on 96 mixed
    triangles + full-result byte equality vs the numpy backend on a
    12-triangle mixed bake."""
    import omm_tpu as omm

    def desc_of(tris, levels):
        tc = np.concatenate(tris).astype(np.float32)
        return omm.BakeInputDesc(
            texture=tex, tex_coords=tc,
            index_buffer=np.arange(3 * len(tris), dtype=np.uint32),
            index_count=3 * len(tris), alpha_cutoff=0.5,
            max_subdivision_level=SUBDIV, dynamic_subdivision_scale=0.0,
            subdivision_levels=np.asarray(levels, np.uint8))

    # parity first (small): byte-identical full results across backends
    small = desc_of(uv_tris[:12], [7, 8, 9] * 4)
    parity = _results_equal(omm.bake(small, backend="pallas"),
                            omm.bake(small, backend="numpy"))

    tris = uv_tris[:96]
    levels = [7, 8, 9] * 32
    utri = sum(1 << (2 * lv) for lv in levels)
    desc = desc_of(tris, levels)
    omm.bake(desc, backend="pallas")
    omm.bake(desc, backend="pallas")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        omm.bake(desc, backend="pallas")
        times.append(time.perf_counter() - t0)
    return utri / min(times), parity


#: progressively-filled result record: the headline lands right after the
#: timed loop, each spot/parity/e2e field lands the moment it is measured.
#: The watchdog prints THIS (plus a "truncated" note) instead of a
#: zero-value error, so a wedge or deadline mid-spot can no longer lose
#: metrics that were already captured (round-4 hardening: the first run
#: after a code change recompiles every signature cold and can overrun).
RESULT: dict = {}


def _arm_watchdog():
    """A tunnel can wedge AFTER the probe passed (mid-compile, mid-fetch);
    a blocking device call then hangs the whole bench past the driver's
    capture window.  A daemon timer emits the best-known partial RESULT
    (or the structured error JSON when not even the headline landed) and
    hard-exits at the deadline so the driver always records a parseable
    line.  OMM_BENCH_DEADLINE seconds, 0 disables.  Default 1500s: the
    driver's capture window is ~1800s (BENCH_r02 was timeout-killed after
    ~1740s of probes)."""
    import threading

    budget = float(os.environ.get("OMM_BENCH_DEADLINE", "1500"))
    done = threading.Event()
    if budget <= 0:
        return done

    def fire():
        if done.wait(budget):
            return
        note = (f"bench exceeded OMM_BENCH_DEADLINE={budget:.0f}s "
                "(device call wedged mid-run)")
        if RESULT.get("value"):
            rec = dict(RESULT)
            rec["truncated"] = note
        else:
            rec = {"metric": "utri_classified_per_sec_per_chip_subdiv9",
                   "value": 0.0, "unit": "utri/s", "vs_baseline": 0.0,
                   "error": note}
        print(json.dumps(rec), flush=True)
        os._exit(1)

    threading.Thread(target=fire, daemon=True).start()
    return done


_T0 = time.monotonic()


def main():
    watchdog_done = _arm_watchdog()
    if not _await_device():
        sys.exit(1)
    import jax

    # Persistent compile cache ON THE TUNNEL BACKEND (verified round 3:
    # executables serialize/deserialize across processes on the axon
    # tunnel; a cold spec-chain compile is ~180 s remote, a warm start
    # cuts the first call to ~106 s).  Keyed by HLO content hash, so
    # code changes invalidate automatically.  OMM_BENCH_CACHE_DIR=""
    # disables.
    cache_dir = os.environ.get(
        "OMM_BENCH_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache_tpu"))
    if cache_dir:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception as e:
            print(f"bench: compile cache unavailable: {e}",
                  file=sys.stderr)

    import omm_tpu as omm
    from omm_tpu import engine
    from omm_tpu.kernels import twophase as tp
    from omm_tpu.kernels import jax_classify as jc

    tex, uv_tris = _workload()
    cfg = _cfg(engine, omm)
    M = omm.get_num_micro_triangles(SUBDIV)
    UO = int(omm.OpacityState.UnknownOpaque)

    def fresh_batches():
        # states=None is the engine's declared fresh-item form (all
        # UnknownOpaque): allocating 256 fresh 4^9-byte state arrays per
        # rep cost ~78 ms of host time — more than the device pipeline
        return [[(t, None) for t in uv_tris[k:k + BATCH]]
                for k in range(0, N_TRIS, BATCH)]

    # Packed output (default): the engine returns serialize-ready OC1
    # 2-bit rows — the same artifact the reference GPU baker's dispatch
    # writes to its output buffer (omm-gpu.h arrayData) — instead of
    # materializing unpacked 4^N-byte arrays host-side.  The parity gate
    # unpacks OUTSIDE the timed loop.  OMM_BENCH_PACKED=0 restores the
    # unpacked-return measurement.
    packed = os.environ.get("OMM_BENCH_PACKED", "1") != "0"
    engine_name = ("twophase_hier_pallas_pipelined_packed" if packed
                   else "twophase_hier_pallas_pipelined")

    def _unpack_all(lst):
        return [st.unpack() if isinstance(st, tp.PackedStates) else st
                for st in lst]

    def run_batch():
        outs = tp.classify_work_items_batches(tex, cfg, fresh_batches(),
                                              SUBDIV, packed_out=packed)
        return [st for batch in outs for st in batch]

    try:
        got = run_batch()   # compile + cap discovery
        got = run_batch()   # tight-cap steady state
        # The tunnel's dispatch path keeps warming for a few iterations
        # after the last compile (measured gradient: 37.8s -> 1.6s ->
        # 0.5s -> ~0.17s steady); settle untimed so the timed loop
        # measures the engine, not the transport warming up.
        for _ in range(3):
            run_batch()
    except Exception:
        engine_name = "xla_gather_fallback"

        def run_batch():
            return [jc.classify_work_item_jax(tex, cfg, t, SUBDIV,
                                              np.full(M, UO, np.uint8))
                    for t in uv_tris]
        got = run_batch()

    # per-rep timing, best-of-N: the tunnel to the chip shares bandwidth
    # with other tenants, so the fastest repetition is the least-noisy
    # estimate of the engine's throughput.  The raw mean is reported
    # alongside a 1-trimmed mean (drop the single slowest rep): tunnel
    # tenancy occasionally injects one multi-hundred-ms stall that says
    # nothing about the engine.
    reps = 13  # best-of-N: more reps = better odds of one tunnel-quiet rep
    times = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        got = run_batch()
        times.append(time.perf_counter() - t0)
    rate = N_TRIS * M / min(times)
    rate_mean = N_TRIS * M / (sum(times) / len(times))
    trimmed = sorted(times)[:-1]
    rate_trim = N_TRIS * M / (sum(trimmed) / len(trimmed))
    rate_median = N_TRIS * M / sorted(times)[len(times) // 2]

    # headline lands in the progressive record immediately: a wedge in a
    # later spot can truncate the run but not erase this measurement
    RESULT.update({
        "metric": "utri_classified_per_sec_per_chip_subdiv9",
        "value": round(rate, 1), "unit": "utri/s",
        "vs_baseline": round(rate / TARGET, 3),
        "mean_utri_per_s": round(rate_mean, 1),
        "trimmed_mean_utri_per_s": round(rate_trim, 1),
        "median_utri_per_s": round(rate_median, 1),
        "rep_times_s": [round(t, 4) for t in times],
        "bit_exact_vs_oracle": None,  # set by the parity gate below
        "engine": engine_name,
        "batch_tris": N_TRIS, "sub_batch": BATCH,
        "device": str(jax.devices()[0]),
    })

    # Device-dependent spots run IMMEDIATELY after the headline reps —
    # before the (long, host-only) full parity pass — and their budgets
    # count from the first successful device op, so neither probe retries
    # nor the oracle pass can starve them.  Order = value: the wrapped
    # spot was round 3's headline feature and shipped unmeasured.
    def spot(name, budget_env, default_s, fn):
        if engine_name == "xla_gather_fallback":
            return None, None
        if _dev_elapsed() > float(os.environ.get(budget_env, default_s)):
            print(f"bench: {name} spot skipped (device budget)",
                  file=sys.stderr)
            return None, None
        try:
            rate_v, ok_v = fn()
            # native types: np.bool_/np.float64 leak from (a == b).all()
            # etc. and are not JSON serializable
            return (None if rate_v is None else float(rate_v),
                    None if ok_v is None else bool(ok_v))
        except Exception as e:
            print(f"bench: {name} spot skipped: {e}", file=sys.stderr)
            return None, None

    wrapped_rate, wrapped_ok = spot(
        "wrapped", "OMM_BENCH_WRAP_BUDGET", "600",
        lambda: _spot_wrapped(tex, uv_tris, cfg))
    RESULT.update({
        "wrapped_utri_per_s": (round(wrapped_rate, 1)
                               if wrapped_rate else None),
        "wrapped_vs_clamp": (round(wrapped_rate / rate, 3)
                             if wrapped_rate else None),
        "wrapped_bit_exact": wrapped_ok})
    large_rate, large_ok = spot(
        "large-mesh", "OMM_BENCH_LARGE_BUDGET", "750",
        lambda: _spot_large_mesh(tex, uv_tris, cfg))
    RESULT.update({
        "large_mesh_utri_per_s": (round(large_rate, 1)
                                  if large_rate else None),
        "large_mesh_bit_exact": large_ok})
    high_rate, high_ok = spot(
        "subdiv11", "OMM_BENCH_HIGHSUBDIV_BUDGET", "850",
        lambda: _spot_highsubdiv(tex, cfg))
    RESULT.update({
        "subdiv11_utri_per_s": round(high_rate, 1) if high_rate else None,
        "subdiv11_bit_exact": high_ok})
    unorm8_rate, unorm8_ok = spot(
        "unorm8", "OMM_BENCH_UNORM8_BUDGET", "950",
        lambda: _spot_unorm8(uv_tris, cfg))
    RESULT.update({
        "unorm8_utri_per_s": (round(unorm8_rate, 1)
                              if unorm8_rate else None),
        "unorm8_bit_exact": unorm8_ok})
    mixed_rate, mixed_ok = spot(
        "mixed-levels", "OMM_BENCH_MIXED_BUDGET", "1050",
        lambda: _spot_mixed_levels(tex, uv_tris))
    RESULT.update({
        "mixed_levels_utri_per_s": (round(mixed_rate, 1)
                                    if mixed_rate else None),
        "mixed_levels_bit_exact": mixed_ok})

    spot_multimip = bool(_spot_multimip())
    spot_nearest = bool(_spot_nearest())
    RESULT.update({"spot_multimip_bit_exact": spot_multimip,
                   "spot_nearest_bit_exact": spot_nearest})

    # Parity gate: ALL N_TRIS triangles of the final timed run vs the
    # numpy oracle — one full oracle pass, outside the timed loop.
    got = _unpack_all(got)
    parity_fail = 0
    for k in range(N_TRIS):
        oracle = engine.resample_fine_item(tex, cfg, uv_tris[k], SUBDIV,
                                           np.full(M, UO, np.uint8))
        if not (got[k] == oracle).all():
            parity_fail += 1
            print(f"parity FAIL tri {k}: "
                  f"{int((got[k] != oracle).sum())}/{M} differ",
                  file=sys.stderr)
    parity = parity_fail == 0
    RESULT.update({
        "bit_exact_vs_oracle": bool(parity and spot_multimip
                                    and spot_nearest),
        "parity_tris": f"{N_TRIS - parity_fail}/{N_TRIS}"})

    # Secondary metric: ONE full production bake of the same workload —
    # classification plus everything around it (pre-bake dedup, exact
    # dedup, special-index promotion, histograms, morton sort, 2-bit
    # pack, index emission) through the public omm.bake API.
    e2e_s = None
    try:
        import omm_tpu as _omm
        # pin the fine-pass batch size to the already-warm timed-loop
        # signature (a new batch size = a multi-minute remote compile)
        os.environ["OMM_BAKE_SUBBATCH"] = str(BATCH)
        tc = np.concatenate(uv_tris).astype(np.float32)  # (3*N, 2)
        desc = _omm.BakeInputDesc(
            texture=tex, tex_coords=tc,
            index_buffer=np.arange(3 * N_TRIS, dtype=np.uint32),
            index_count=3 * N_TRIS, alpha_cutoff=0.5,
            max_subdivision_level=SUBDIV, dynamic_subdivision_scale=0.0)
        # two warm reps (the tunnel's dispatch path keeps warming after
        # the last compile — a single warm rep under-reports ~2x), then
        # best-of-3: same tenancy-noise discipline as the main metric
        _omm.bake(desc, backend="pallas")
        _omm.bake(desc, backend="pallas")
        e2e_reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            _omm.bake(desc, backend="pallas")
            e2e_reps.append(time.perf_counter() - t0)
        e2e_s = min(e2e_reps)
    except Exception as e:
        print(f"bench: e2e bake metric skipped: {e}", file=sys.stderr)

    RESULT.update({
        "e2e_bake_s": round(e2e_s, 4) if e2e_s is not None else None,
        "e2e_bake_utri_per_s": (round(N_TRIS * M / e2e_s, 1)
                                if e2e_s else None)})

    watchdog_done.set()
    print(json.dumps(RESULT))
    # a skipped spot (None) is not a failure; a spot that RAN and
    # diverged is
    spots_ok = all(ok is not False for ok in (
        wrapped_ok, large_ok, high_ok, unorm8_ok, mixed_ok))
    if not (parity and spot_multimip and spot_nearest and spots_ok):
        sys.exit(1)


if __name__ == "__main__":
    main()
