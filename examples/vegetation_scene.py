"""End-to-end vegetation-scene bake (BASELINE.json config #5).

Builds a procedural foliage atlas (leaf clusters on a transparent
background), instantiates a few hundred alpha-tested quads that share a
handful of UV mappings (the texture-coordinate instancing pattern OMM
block reuse exists for), bakes the whole scene in one call, round-trips
the result through the LZ4-compressed serialized blob, and prints the
viewer-tool statistics: per-state totals, OMM block reuse, known/unknown
ratios, array sizes.

Run: python examples/vegetation_scene.py [--backend pallas] [--subdiv 9]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import omm_tpu as omm  # noqa: E402
from omm_tpu.baker import Baker


def foliage_atlas(size: int = 512, seed: int = 7) -> np.ndarray:
    """Leaf-cluster alpha texture: soft elliptic leaves with serrated
    edges on a transparent background."""
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.arange(size, dtype=np.float32),
                         np.arange(size, dtype=np.float32), indexing="ij")
    alpha = np.zeros((size, size), np.float32)
    for _ in range(140):
        cx, cy = rng.rand(2) * size
        ang = rng.rand() * np.pi
        la, lb = 8 + rng.rand() * 40, 4 + rng.rand() * 14
        dx = (xx - cx) * np.cos(ang) + (yy - cy) * np.sin(ang)
        dy = -(xx - cx) * np.sin(ang) + (yy - cy) * np.cos(ang)
        r = (dx / la) ** 2 + (dy / lb) ** 2
        serration = 0.12 * np.sin(np.arctan2(dy, dx) * 9.0)
        leaf = np.clip(1.2 - r + serration, 0.0, 1.0)
        alpha = np.maximum(alpha, leaf.astype(np.float32))
    return np.clip(alpha, 0.0, 1.0).astype(np.float32)


def quad_mesh(n_quads: int, n_uv_variants: int = 6, seed: int = 3):
    """n_quads alpha-tested quads; UV rectangles drawn from a small pool
    of variants so OMM reuse detection has real work to do."""
    rng = np.random.RandomState(seed)
    variants = []
    for _ in range(n_uv_variants):
        u0, v0 = rng.rand(2) * 0.5
        du, dv = 0.2 + rng.rand(2) * 0.3
        variants.append(np.array([[u0, v0], [u0, v0 + dv],
                                  [u0 + du, v0], [u0 + du, v0 + dv]],
                                 np.float32))
    uvs = []
    indices = []
    for q in range(n_quads):
        base = len(uvs)
        uvs.extend(variants[rng.randint(n_uv_variants)])
        indices.extend([base, base + 1, base + 2,
                        base + 3, base + 1, base + 2])
    return (np.asarray(uvs, np.float32),
            np.asarray(indices, np.uint32))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="numpy",
                    choices=["numpy", "jax", "pallas", "auto"])
    ap.add_argument("--subdiv", type=int, default=7)
    ap.add_argument("--quads", type=int, default=200)
    ap.add_argument("--atlas", type=int, default=512)
    ap.add_argument("--out", default=None, help="write the blob here")
    args = ap.parse_args(argv)

    atlas = foliage_atlas(args.atlas)
    uvs, indices = quad_mesh(args.quads)

    baker = Baker(lambda sev, msg: print(f"[{sev}] {msg}"))
    tex = baker.create_texture([atlas], omm.TextureFormat.FP32,
                               alpha_cutoff=0.5)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=uvs, index_buffer=indices,
        index_count=len(indices), alpha_cutoff=0.5,
        max_subdivision_level=args.subdiv,
        bake_flags=omm.BakeFlags.EnableNearDuplicateDetection)

    t0 = time.perf_counter()
    result = baker.bake(desc, backend=args.backend)
    bake_s = time.perf_counter() - t0

    # LZ4 round trip
    blob = baker.serialize(input_descs=[desc], result_descs=[result],
                           compress=True)
    rt = baker.deserialize(blob).result_descs[0]
    assert np.array_equal(rt.array_data, result.array_data)
    assert np.array_equal(rt.index_buffer, result.index_buffer)

    # viewer-tool statistics
    stats = omm.get_stats(result)
    tri_count = len(indices) // 3
    omm_refs = np.asarray(result.index_buffer).astype(np.int64)
    reused = tri_count - len(result.desc_array) \
        - int((omm_refs < 0).sum())
    total = (stats.total_opaque + stats.total_transparent
             + stats.total_unknown_opaque + stats.total_unknown_transparent)
    known = stats.total_opaque + stats.total_transparent
    print(json.dumps({
        "triangles": tri_count,
        "omm_blocks": len(result.desc_array),
        "reused_refs": int(reused),
        "special_index_tris": int((omm_refs < 0).sum()),
        "micro_triangles": int(total),
        "known_ratio": round(known / max(total, 1), 4),
        "array_data_bytes": int(len(result.array_data)),
        "blob_bytes": len(blob),
        "bake_seconds": round(bake_s, 3),
        "backend": args.backend,
    }, indent=2))

    if args.out:
        baker.save_binary_to_disk(blob, args.out)
        print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
