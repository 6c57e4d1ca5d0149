"""Static tessellated-triangle resources in bird-curve order.

Analog of ommGpuGetStaticResourceData (bake_gpu_impl.cpp:90-234): per
subdivision level 0..9 a row-linear vertex buffer of packed (j<<16 | i)
discrete barycentrics and an index buffer whose primitives are shuffled
into bird-curve order.  Clients use these to tessellate macro triangles —
here also handy for visualization and renderer integration.
"""
from __future__ import annotations

import numpy as np

from .. import bird

MAX_STATIC_SUBDIV = 9  # HW-raster path limit (bake_gpu_impl.cpp:98)


def static_vertex_buffer(level: int) -> np.ndarray:
    """Packed (j << 16 | i) vertices, row-linear; (N+1)(N+2)/2 entries."""
    n = 1 << level
    out = []
    for j in range(n + 1):
        for i in range(j + 1):
            out.append((j << 16) | i)
    return np.asarray(out, dtype=np.uint32)


def static_index_buffer(level: int) -> np.ndarray:
    """Tessellated-triangle topology, primitives in bird-curve order,
    vertices row-linear (bake_gpu_impl.cpp:108-163)."""
    n = 1 << level
    out = np.zeros(3 * (4 ** level), dtype=np.uint32)

    def vert_idx(x, y):
        return x + (y * (y + 1)) // 2

    for j in range(n):
        for i in range(2 * j + 1):
            u = i // 2
            v = n - 1 - j
            w = (n - 1 - u - v) - (i % 2)
            oc = int(bird.dbary2index(np.uint32(u), np.uint32(v),
                                      np.uint32(w), level))
            x, y = i // 2, j
            if i % 2 == 0:
                tri = (vert_idx(x, y), vert_idx(x + 1, y + 1),
                       vert_idx(x, y + 1))
            else:
                tri = (vert_idx(x, y), vert_idx(x + 1, y),
                       vert_idx(x + 1, y + 1))
            out[3 * oc:3 * oc + 3] = tri
    return out


def get_static_resource_data(resource: str) -> dict:
    """All levels concatenated with per-level offsets, mirroring the
    reference's single-blob layout."""
    if resource == "STATIC_VERTEX_BUFFER":
        bufs = [static_vertex_buffer(l) for l in range(MAX_STATIC_SUBDIV + 1)]
    elif resource == "STATIC_INDEX_BUFFER":
        bufs = [static_index_buffer(l) for l in range(MAX_STATIC_SUBDIV + 1)]
    else:
        raise ValueError(f"unknown static resource {resource}")
    offsets = np.cumsum([0] + [b.nbytes for b in bufs])
    return {"data": np.concatenate(bufs),
            "offsets": offsets[:-1].tolist(),
            "size": int(offsets[-1])}
