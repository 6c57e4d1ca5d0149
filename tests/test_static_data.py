"""Static resources + basic lifecycle (test_basic.cpp analog)."""
import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import bird
from omm_tpu.gpu.static_data import (get_static_resource_data,
                                     static_index_buffer,
                                     static_vertex_buffer)


@pytest.mark.parametrize("level", [0, 1, 2, 3, 5])
def test_static_buffers_consistent(level):
    vb = static_vertex_buffer(level)
    ib = static_index_buffer(level)
    n = 1 << level
    assert len(vb) == (n + 1) * (n + 2) // 2
    assert len(ib) == 3 * 4 ** level
    assert ib.max() < len(vb)

    # Every bird-index primitive must tessellate to the same micro-triangle
    # corners as index2bary: reconstruct barycentrics from packed verts.
    uv0, uv1, uv2 = bird.index2bary(np.arange(4 ** level, dtype=np.uint32),
                                    level)
    scale = np.float32(1.0 / n)
    for prim in range(4 ** level):
        corners = []
        for k in range(3):
            packed = int(vb[ib[3 * prim + k]])
            i, j = packed & 0xFFFF, packed >> 16
            # row-linear grid: u = i/N, v = (N - j)/N  (apex row j=0 is v=1)
            corners.append((i * scale, (n - j) * scale))
        got = {tuple(np.round(c, 6)) for c in corners}
        want = {tuple(np.round(c, 6)) for c in
                [uv0[prim], uv1[prim], uv2[prim]]}
        assert got == want, (level, prim, got, want)


def test_static_resource_blob():
    d = get_static_resource_data("STATIC_INDEX_BUFFER")
    assert len(d["offsets"]) == 10
    assert d["size"] == d["data"].nbytes
    with pytest.raises(ValueError):
        get_static_resource_data("NOPE")


def test_baker_lifecycle():
    """test_basic.cpp handle-lifecycle analog."""
    baker = omm.Baker()
    tex = baker.create_texture([np.zeros((4, 4), np.float32)],
                               omm.TextureFormat.FP32)
    pipe = baker.create_gpu_pipeline()
    desc = pipe.get_pipeline_desc()
    assert "omm_rasterize_cs" in desc["passes"]
    assert desc["static_samplers"] == 8
