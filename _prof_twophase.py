"""Two-phase engine: parity vs numpy oracle + end-to-end throughput."""
import time
import numpy as np

import omm_tpu as omm
from omm_tpu import engine
from omm_tpu.kernels import twophase as tp

SUBDIV = 9
N_TRIS = 8

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


def fresh_items():
    return [(t, np.full(M, 3, np.uint8)) for t in uv_tris]


t0 = time.perf_counter()
got = tp.classify_work_items_batch(tex, cfg, fresh_items(), SUBDIV)
print("first (compile) run:", round(time.perf_counter() - t0, 1), "s")
for k in (0, 3, 7):
    oracle = engine.resample_fine_item(tex, cfg, uv_tris[k],
                                       SUBDIV, np.full(M, 3, np.uint8))
    same = (got[k] == oracle).all()
    print(f"tri {k}: parity={bool(same)}"
          + ("" if same else f"  ndiff={(got[k]!=oracle).sum()}"))

reps = 5
t0 = time.perf_counter()
for _ in range(reps):
    got = tp.classify_work_items_batch(tex, cfg, fresh_items(), SUBDIV)
dt = (time.perf_counter() - t0) / reps
rate = N_TRIS * M / dt
print(f"end-to-end: {dt*1e3:.2f} ms/batch -> {rate/1e6:.1f} Mutri/s")

# ---- stage decomposition ----
import jax, jax.numpy as jnp
from omm_tpu import geom

items = fresh_items()
fast = list(range(N_TRIS))
uv_arr = np.stack([items[i][0] for i in fast]).astype(np.float32)
ccw = np.array([bool(geom.is_ccw(items[i][0])) for i in fast])
active = np.stack([items[i][1] == 3 for i in fast])

mips, pads, HWs, ntxs, planePs, tilesEs = [], [], [], [], [], []
for mip in range(tex.mip_count):
    Hb, Wb = tp._mip_window(tex, uv_tris[0], SUBDIV, mip)
    He, We = Hb + 2, Wb + 2
    TSA = tp.TILE + max(He, We)
    pad = TSA
    planeP, tilesE, nty, ntx = tp._planes_cached(tex, mip, cfg.addr_mode, pad, TSA)
    mips.append(tex.size(mip)); pads.append(pad); HWs.append((Hb, Wb))
    ntxs.append(ntx); planePs.append(planeP); tilesEs.append(tilesE)

K_cap = tex._omm_k_cap[(SUBDIV, N_TRIS)]
print("K_cap", K_cap)

def t(name, f, reps=5):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s}: {dt*1e3:8.2f} ms")
    return r

uvJ = jnp.asarray(uv_arr); ccwJ = jnp.asarray(ccw); actJ = jnp.asarray(active)

def s1():
    return tp._stage1(tuple(planePs), uvJ, ccwJ, actJ, subdiv=SUBDIV,
                      K_cap=K_cap, mips=tuple(mips), pads=tuple(pads),
                      HWs=tuple(HWs), cutoff=0.5, margin=tp.PHASE1_MARGIN,
                      ntxs=tuple(ntxs))
res = t("stage1 device", s1)
side, ids, kvalid, meta, slots = res
meta_np = np.asarray(meta)
print("meta:", meta_np)
K = int(meta_np[0]); padM = int(meta_np[2])
nblk = max(tp._next_pow2((padM + tp.B - 1) // tp.B), 8)
print("K", K, "padM", padM, "nblk", nblk)

info = tex.info[0]
def s2():
    return tp._stage2_mip(tilesEs[0], uvJ, ccwJ, ids, kvalid,
                          slots[0][0], slots[0][1], subdiv=SUBDIV,
                          K_cap=K_cap, nblk=nblk, w=w, h=h, pad=pads[0],
                          ntx=ntxs[0], H=HWs[0][0], W=HWs[0][1],
                          rcp=(float(info.rcp_size[0]), float(info.rcp_size[1])),
                          alpha_cutoff=0.5)
ab = t("stage2 device", s2)

def s3():
    return tp._stage3(side, ids, kvalid, (ab,), subdiv=SUBDIV, fmt=cfg.fmt,
                      promotion=cfg.promotion, cutoff_gt=cfg.cutoff_gt,
                      cutoff_le=cfg.cutoff_le)
pk3 = t("stage3 device", s3)
t("fetch packed 512KB", lambda: np.asarray(s3()))
