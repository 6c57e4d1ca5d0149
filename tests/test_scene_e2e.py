"""Scene-level end-to-end bake (BASELINE.json config #5): vegetation
scene, LZ4 serialization round trip, block reuse, viewer stats."""
import os
import sys

import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu.baker import Baker

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))
from vegetation_scene import foliage_atlas, quad_mesh  # noqa: E402


@pytest.mark.slow
def test_vegetation_scene_end_to_end():
    atlas = foliage_atlas(256)
    uvs, indices = quad_mesh(60, n_uv_variants=5)
    baker = Baker()
    tex = baker.create_texture([atlas], omm.TextureFormat.FP32,
                               alpha_cutoff=0.5)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=uvs, index_buffer=indices,
        index_count=len(indices), alpha_cutoff=0.5,
        max_subdivision_level=5,
        bake_flags=omm.BakeFlags.EnableNearDuplicateDetection)
    result = baker.bake(desc)

    tri_count = len(indices) // 3
    # UV-instanced quads must share OMM blocks (pre-bake dedup)
    assert len(result.desc_array) < tri_count // 3
    refs = np.asarray(result.index_buffer).astype(np.int64)
    assert (refs >= 0).sum() == tri_count  # foliage: nothing fully uniform

    # LZ4 round trip is bit-exact
    blob = baker.serialize(input_descs=[desc], result_descs=[result],
                           compress=True)
    d = baker.deserialize(blob)
    rt = d.result_descs[0]
    assert np.array_equal(rt.array_data, result.array_data)
    assert np.array_equal(rt.index_buffer, result.index_buffer)

    # stats sanity: Debug::Stats iterates triangles (parse.h:64-96), so
    # the totals count each referenced OMM once per referencing triangle
    s = omm.get_stats(result)
    total = (s.total_opaque + s.total_transparent + s.total_unknown_opaque
             + s.total_unknown_transparent)
    per_tri = sum(
        omm.get_num_micro_triangles(
            result.desc_array[refs[t]].subdivision_level)
        for t in range(tri_count) if refs[t] >= 0)
    assert total == per_tri

    # device backends produce the identical scene bake (this content has
    # smooth near-cutoff alphas: it catches fp-contraction and inexact-
    # sqrt divergence that binary test textures cannot — see
    # kernels.levelline.guard / exact_sqrt)
    result_j = baker.bake(desc, backend="jax")
    assert np.array_equal(result_j.array_data, result.array_data)


@pytest.mark.slow
def test_vegetation_scene_pallas_backend(monkeypatch):
    """Two-phase engine (interpret mode) on the smooth-alpha scene."""
    import jax.experimental.pallas as plmod
    import omm_tpu.kernels.pallas_classify as pk

    orig = plmod.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pk.pl, "pallas_call", interp)

    atlas = foliage_atlas(128)
    uvs, indices = quad_mesh(20, n_uv_variants=4)
    baker = Baker()
    tex = baker.create_texture([atlas], omm.TextureFormat.FP32,
                               alpha_cutoff=0.5)
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=uvs, index_buffer=indices,
        index_count=len(indices), alpha_cutoff=0.5,
        max_subdivision_level=4)
    a = baker.bake(desc)
    b = baker.bake(desc, backend="pallas")
    assert np.array_equal(a.array_data, b.array_data)
    assert np.array_equal(a.index_buffer, b.index_buffer)


@pytest.mark.slow
def test_readback_and_debug_example(tmp_path):
    """The integration-guide companion example (guide sections 5.2, 9.1,
    14) must stay runnable: histogram readback -> driver-build usage
    counts, alpha-blend workflow, and the full debug cookbook."""
    from readback_and_debug import main as example_main
    res, files, messages = example_main(str(tmp_path))
    assert len(files) == 2 and all(os.path.exists(p) for p in files)
    assert len(res.desc_array) > 0
