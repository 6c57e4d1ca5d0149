"""Attribution experiment for the wrapped-UV bench ratio (VERDICT r04 #6).

The wrapped spot (bench.py::_spot_wrapped) scales each UV triangle by 3x
(t*3+1) over a Wrap-mode texture, so every triangle's texel-space
footprint is 3x linear / 9x area vs the clamp headline.  The two-phase
engine's device work scales with CONTOUR TEXELS PER TRIANGLE, not with
µtri count — so the 0.304x throughput ratio may be the workload (more
contour per µtri), not the wrap path (period planes, modular anchors).

Three workloads through the same engine, same 128-tri batch, subdiv 9:
  A. clamp     — the headline workload (1024^2 tex, tris span ~0.65 UV)
  B. wrapped   — the wrapped spot (same tex, Wrap, tris span ~1.95 UV)
  C. tiled     — CONTROL: 4x4-tiled 4096^2 clamp texture (pow2, so the
                 fast path admits it), uv' = (t*3+1)/4 — an exact fp32
                 divide, so texel coordinates (uv' * 4096 = (t*3+1) *
                 1024) match B's wrap sampling exactly.  Texel-space
                 footprint identical to B, wrap path unused.

Reported per workload: per-level unresolved node counts (Cs_true), the
exact-kernel survivor count K, and per-mip padded final-level counts —
read from the capacity-discovery sync (the same numbers that size every
device buffer, so they ARE the device-work attribution).  If B ~= C >>
A, the ratio is workload-intrinsic; any B-over-C excess is the true
wrap-path cost.

Run on CPU (JAX_PLATFORMS=cpu); counts are platform-independent.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pins the TPU-tunnel backend at interpreter start; the
    # env var alone is too late (see tests/conftest.py) — force via config
    import jax

    jax.config.update("jax_platforms", "cpu")
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import omm_tpu as omm
from omm_tpu import engine
from omm_tpu.kernels import twophase as tp

SUBDIV = int(os.environ.get("OMM_ATTR_SUBDIV", "9"))
T = int(os.environ.get("OMM_ATTR_TRIS", "128"))


def _plane(w):
    j, i = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    u = i / np.float32(w)
    v = j / np.float32(w)
    r = np.sqrt((u - 0.5) ** 2 + (v - 0.5) ** 2)
    p = np.where(r < np.float32(0.4), np.float32(0.0),
                 np.float32(1.0)).astype(np.float32)
    p[0, 0] = np.float32(0.6)
    return p


def _tris():
    rng = np.random.RandomState(42)
    out = []
    for _ in range(T):
        base = rng.rand(2).astype(np.float32) * 0.2
        out.append(np.array([base + [0.05, 0.1], base + [0.1, 0.7],
                             base + [0.7, 0.65]], dtype=np.float32))
    return out


def _cfg(addr):
    return engine.ResampleConfig(
        addr_mode=addr, filter=omm.TextureFilterMode.Linear,
        alpha_cutoff=0.5, border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)


def _run(name, tex, cfg, tris):
    lg = tp._group_level(tex, tris, SUBDIV)
    ok = tp._fast_path_mask(tex, cfg, np.stack(tris), SUBDIV, lg).all()
    assert ok, f"{name}: not on fast path"
    out = tp.classify_work_items_batches(tex, cfg, [[(t, None) for t in tris]],
                                         SUBDIV)
    caps = tex._omm_caps
    (key, (Cs, K_cap, nblks)), = caps.items()
    print(f"{name:8s} levels={key[1]} Cs(bucketed+margin)={list(Cs)} "
          f"K_cap={K_cap} nblk={list(nblks)}")
    return out[0], (Cs, K_cap, nblks)


def main():
    base = _plane(1024)
    tris = _tris()

    tex_a = omm.Texture([base], omm.TextureFormat.FP32)
    sa, caps_a = _run("clamp", tex_a, _cfg(omm.TextureAddressMode.Clamp),
                      tris)

    tex_b = omm.Texture([base], omm.TextureFormat.FP32)
    wtris = [t * np.float32(3.0) + np.float32(1.0) for t in tris]
    sb, caps_b = _run("wrapped", tex_b, _cfg(omm.TextureAddressMode.Wrap),
                      wtris)

    tiled = np.tile(base, (4, 4))
    tex_c = omm.Texture([tiled], omm.TextureFormat.FP32)
    ctris = [(t * np.float32(3.0) + np.float32(1.0)) / np.float32(4.0)
             for t in tris]
    sc, caps_c = _run("tiled", tex_c, _cfg(omm.TextureAddressMode.Clamp),
                      ctris)

    # wrapped and tiled sample identical alpha at every point that is not
    # exactly on a period seam; states should agree almost everywhere
    M = omm.get_num_micro_triangles(SUBDIV)
    diff = sum(int((np.asarray(b.unpack() if hasattr(b, "unpack") else b)
                    != np.asarray(c.unpack() if hasattr(c, "unpack") else c))
                   .sum()) for b, c in zip(sb, sc))
    print(f"wrapped-vs-tiled state mismatches: {diff} / {T * M} "
          f"(fp seam effects only; NOT a parity gate)")

    ksum = lambda caps: int(caps[1])
    csum = lambda caps: sum(int(c) for c in caps[0])
    print(f"\nsurvivor-cap ratio wrapped/clamp: "
          f"{ksum(caps_b) / ksum(caps_a):.2f}   "
          f"tiled/clamp: {ksum(caps_c) / ksum(caps_a):.2f}")
    print(f"node-cap sum ratio wrapped/clamp: "
          f"{csum(caps_b) / csum(caps_a):.2f}   "
          f"tiled/clamp: {csum(caps_c) / csum(caps_a):.2f}")


if __name__ == "__main__":
    main()
