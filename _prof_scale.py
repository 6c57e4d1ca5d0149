import time
import numpy as np
import omm_tpu as omm
from omm_tpu import engine
from omm_tpu.kernels import twophase as tp

SUBDIV = 9
w = h = 1024
jj, ii = np.meshgrid(np.arange(h, dtype=np.float32),
                     np.arange(w, dtype=np.float32), indexing="ij")
r = np.sqrt((ii / w - 0.5) ** 2 + (jj / h - 0.5) ** 2)
plane = np.where(r < np.float32(0.4), np.float32(0.0),
                 np.float32(1.0)).astype(np.float32)
plane[0, 0] = np.float32(0.6)
tex = omm.Texture([plane], omm.TextureFormat.FP32)
cfg = engine.ResampleConfig(
    addr_mode=omm.TextureAddressMode.Clamp,
    filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
    border_alpha=0.0, fmt=omm.Format.OC1_4_State,
    promotion=omm.UnknownStatePromotion.Nearest,
    cutoff_gt=omm.OpacityState.Opaque,
    cutoff_le=omm.OpacityState.Transparent)
M = omm.get_num_micro_triangles(SUBDIV)

def make_tris(n):
    rng = np.random.RandomState(42)
    tris = []
    for _ in range(n):
        base = rng.rand(2).astype(np.float32) * 0.2
        tris.append(np.array([base + [0.05, 0.1], base + [0.1, 0.7],
                              base + [0.7, 0.65]], np.float32))
    return tris

import sys
for T in (32, 64):
    tris = make_tris(T)
    items = [(t, np.full(M, 3, np.uint8)) for t in tris]
    t0 = time.perf_counter()
    got = tp.classify_work_items_batch(tex, cfg, items, SUBDIV)
    print(f"T={T}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        items = [(t, np.full(M, 3, np.uint8)) for t in tris]
        got = tp.classify_work_items_batch(tex, cfg, items, SUBDIV)
    dt = (time.perf_counter() - t0) / reps
    print(f"T={T}: {dt*1e3:8.1f} ms/batch -> {T*M/dt/1e6:7.1f} Mutri/s",
          flush=True)
# verify parity on last batch, tri 0
oracle = engine.resample_fine_item(tex, cfg, tris[0], SUBDIV,
                                   np.full(M, 3, np.uint8))
print("parity tri0:", bool((got[0] == oracle).all()))
