"""Validation message strings (test_omm_log.cpp parity) + debug dumps."""
import os

import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu.baker import Baker
from omm_tpu.log import MessageSeverity

from fixtures import standard_circle


def _bake_with_messages(mutate, expect_result, expected_msgs):
    msgs = []
    baker = Baker(lambda sev, m: msgs.append((sev, m)))
    tex = baker.create_texture([standard_circle(16, 16)],
                               omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex, dynamic_subdivision_scale=0.0,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0]], np.float32),
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        max_subdivision_level=2)
    mutate(desc, baker)
    if expect_result == omm.Result.SUCCESS:
        baker.bake(desc)
    else:
        with pytest.raises(omm.BakeError) as ei:
            baker.bake(desc)
        assert ei.value.result == expect_result
    texts = [m for _, m in msgs]
    for e in expected_msgs:
        assert any(e in t for t in texts), (e, texts)
    return msgs


def test_log_no_texture():
    _bake_with_messages(
        lambda d, b: setattr(d, "texture", None),
        omm.Result.INVALID_ARGUMENT,
        ["[Invalid Argument] - ommCpuBakeInputDesc has no texture set"])


def test_log_no_index_format():
    _bake_with_messages(
        lambda d, b: setattr(d, "index_format", None),
        omm.Result.INVALID_ARGUMENT,
        ["[Invalid Argument] - indexFormat is not set"])


def test_log_max_subdiv():
    _bake_with_messages(
        lambda d, b: setattr(d, "max_subdivision_level", 13),
        omm.Result.INVALID_ARGUMENT,
        ["[Invalid Argument] - maxSubdivisionLevel (13) is greater than "
         "maximum supported (12)"])


def test_log_alpha_cutoff_mismatch():
    def mutate(d, b):
        d.texture = b.create_texture([standard_circle(16, 16)],
                                     omm.TextureFormat.FP32,
                                     alpha_cutoff=0.3)
        d.alpha_cutoff = 0.4
    _bake_with_messages(
        mutate, omm.Result.INVALID_ARGUMENT,
        ["[Invalid Argument] - Texture object alpha cutoff threshold "
         "(0.300000) is different from alpha cutoff threshold in bake "
         "input (0.400000)"])


def test_log_2state_incompatible():
    def mutate(d, b):
        d.format = omm.Format.OC1_2_State
        d.alpha_cutoff_less_equal = omm.OpacityState.UnknownOpaque
    _bake_with_messages(
        mutate, omm.Result.INVALID_ARGUMENT,
        ["[Invalid Argument] - alphaCutoffLessEqual=UnknownOpaque is not "
         "compatible with OC1_2_State"])


def test_log_unclassifiable_info():
    def mutate(d, b):
        d.tex_coords = np.array([[0, 0], [0, np.nan], [1, 0]], np.float32)
        d.bake_flags = omm.BakeFlags.EnableValidation
    msgs = _bake_with_messages(
        mutate, omm.Result.SUCCESS,
        ["[Info] - The workload consists of 1 unclassifiable triangles, "
         "these will be classified as unresolvedTriState = "
         "Fully Unknown Opaque."])
    assert msgs[0][0] == MessageSeverity.Info


def test_log_perf_warning():
    msgs = []
    baker = Baker(lambda sev, m: msgs.append((sev, m)))
    tex = baker.create_texture([standard_circle(1024, 1024)],
                               omm.TextureFormat.FP32)
    # 129 full-texture triangles -> > 2^27 texel workload.
    tc = np.array([[0, 0], [0, 1.1], [1.1, 0]], np.float32)
    ib = np.tile(np.array([0, 1, 2], np.uint32), 129)
    desc = omm.BakeInputDesc(
        texture=tex, dynamic_subdivision_scale=0.0, tex_coords=tc,
        index_buffer=ib, index_count=len(ib), max_subdivision_level=0,
        bake_flags=(omm.BakeFlags.EnableValidation
                    | omm.BakeFlags.DisableDuplicateDetection))
    baker.bake(desc)
    warns = [m for s, m in msgs if s == MessageSeverity.PerfWarning]
    assert warns and "unusually large" in warns[0] \
        and "1024x1024 textures" in warns[0]


def test_save_as_images(tmp_path):
    baker = Baker()
    tex = baker.create_texture([standard_circle(64, 64)],
                               omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex, dynamic_subdivision_scale=0.0,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
        max_subdivision_level=3)
    res = baker.bake(desc)
    files = baker.save_as_images(desc, res, str(tmp_path), file_postfix="t")
    assert len(files) == 1 and os.path.exists(files[0])
    from PIL import Image
    img = np.asarray(Image.open(files[0]))
    assert img.shape == (64 * 5, 64 * 5, 3)
    # overlay must contain state colors (green opaque / blue transparent)
    assert (img[..., 1] > 200).any() and (img[..., 2] > 200).any()

    files = baker.save_as_images(desc, res, str(tmp_path), one_file=False,
                                 file_postfix="p")
    assert len(files) == 2


def test_save_as_images_detailed_cutout(tmp_path):
    """detailedCutout renders per-OMM cropped closeups of each primitive's
    UV AABB at high zoom (debug_impl.cpp:189-250): distinct per-prim
    images, viewport = the triangle's UV AABB (so the two quad halves,
    which share only the diagonal, produce different crops), state fill +
    red contour present.  oneFile+detailedCutout is INVALID_ARGUMENT
    (debug_impl.cpp:137-138)."""
    baker = Baker()
    tex = baker.create_texture([standard_circle(64, 64)],
                               omm.TextureFormat.FP32)
    # asymmetric quad halves -> different UV AABBs -> different crops
    desc = omm.BakeInputDesc(
        texture=tex, dynamic_subdivision_scale=0.0,
        tex_coords=np.array([[0.05, 0.1], [0.1, 0.9], [0.6, 0.2],
                             [0.95, 0.85]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
        max_subdivision_level=3)
    res = baker.bake(desc)

    with pytest.raises(omm.BakeError) as ei:
        baker.save_as_images(desc, res, str(tmp_path), one_file=True,
                             detailed_cutout=True)
    assert ei.value.result == omm.Result.INVALID_ARGUMENT

    files = baker.save_as_images(desc, res, str(tmp_path), one_file=False,
                                 detailed_cutout=True, file_postfix="c")
    assert len(files) == 2 and all(os.path.exists(f) for f in files)
    from PIL import Image
    imgs = [np.asarray(Image.open(f)) for f in files]
    # distinct per-OMM closeups: crops differ in shape or content
    assert imgs[0].shape != imgs[1].shape \
        or not np.array_equal(imgs[0], imgs[1])
    for img in imgs:
        h, w = img.shape[:2]
        # zoomed far beyond the plain per-prim overlay (64*5)
        assert h * w > (64 * 5) ** 2
        # state fill present (green opaque / blue transparent)...
        assert (img[..., 1] > 200).any() and (img[..., 2] > 200).any()
        # ...and the red cutoff-contour line
        assert ((img[..., 0] > 240) & (img[..., 1] < 30)
                & (img[..., 2] < 30)).any()


def test_get_stats2_known_area():
    baker = Baker()
    tex = baker.create_texture([np.full((64, 64), 0.9, np.float32)],
                               omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex, dynamic_subdivision_scale=0.0,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
        max_subdivision_level=2)
    res = baker.bake(desc)
    s = baker.get_stats2(res)
    assert s.known_area_metric == pytest.approx(1.0)


def test_user_allocator_receives_output_buffers():
    """StdAllocator analog (std_allocator.h): user callbacks observe the
    output allocations and the byte accounting matches."""
    import numpy as np
    import omm_tpu as omm
    from omm_tpu.allocator import StdAllocator
    from omm_tpu.baker import Baker
    from fixtures import standard_circle

    calls = []

    def user_alloc(nbytes, alignment, arg):
        calls.append((nbytes, alignment, arg))
        return np.zeros(nbytes, np.uint8)

    alloc = StdAllocator(allocate=user_alloc, user_arg="ctx")
    baker = Baker(allocator=alloc)
    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0]], np.float32),
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        max_subdivision_level=3)
    res = baker.bake(desc)
    assert calls and all(arg == "ctx" for _, _, arg in calls)
    assert alloc.stats.total_bytes >= len(res.array_data)
    assert alloc.stats.peak_bytes > 0
    # default allocator path still works
    res2 = Baker().bake(desc)
    assert np.array_equal(res.array_data, res2.array_data)


def test_viewer_session_tweak_rebake(tmp_path):
    """Headless viewer (tools/viewer analog): load blob, tweak, re-bake,
    render, zoom, save."""
    import numpy as np
    import omm_tpu as omm
    from omm_tpu.baker import Baker
    from omm_tpu.viewer import ViewerSession
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
        max_subdivision_level=4)
    res = omm.bake(desc)
    baker = Baker()
    blob = baker.serialize(input_descs=[desc], result_descs=[res],
                           compress=True)

    vs = ViewerSession(blob)
    assert vs.stats() == omm.get_stats(res)
    vs.set_param("max_subdivision_level", 3)
    vs.set_param("alpha_cutoff", 0.4)
    s2 = vs.stats()  # re-baked with tweaks
    assert s2.total_opaque + s2.total_transparent \
        + s2.total_unknown_opaque + s2.total_unknown_transparent \
        == 2 * 4 ** 3
    img = vs.render(scale=2)
    assert img.shape == (64, 64, 3)
    z = vs.zoom(0, scale=4)
    assert z.ndim == 3
    vs.reset_all()
    assert vs.params()["max_subdivision_level"] == 4
    p = vs.save_blob(str(tmp_path / "tweaked.bin"))
    vs2 = ViewerSession(p)
    assert vs2.stats() == vs.stats()


def test_capi_flat_surface_roundtrip():
    """Flat omm.h-style facade (capi.py): create baker/texture, bake,
    serialize round-trip, stats, static GPU data."""
    import numpy as np
    from omm_tpu import capi, TextureFormat, BakeInputDesc
    from fixtures import standard_circle

    ld = capi.omm_get_library_desc()
    assert (ld.version_major, ld.version_minor, ld.version_build) \
        == (1, 9, 0)
    bk = capi.omm_create_baker()
    tex = capi.omm_cpu_create_texture(bk, [standard_circle(32, 32)],
                                      TextureFormat.FP32)
    td = capi.omm_cpu_get_texture_desc(tex)
    assert td.format == TextureFormat.FP32 and td.mip_count == 1
    assert td.mips == ((32, 32, 32),) and td.alpha_cutoff == -1.0
    desc = BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0, 0], [0, 1], [1, 0]], np.float32),
        index_buffer=np.array([0, 1, 2], np.uint32), index_count=3,
        max_subdivision_level=3)
    res = capi.omm_cpu_bake(bk, desc)
    s = capi.omm_debug_get_stats(res)
    assert (s.total_opaque + s.total_transparent + s.total_unknown_opaque
            + s.total_unknown_transparent) == 4 ** 3
    blob = capi.omm_cpu_serialize(bk, input_descs=[desc],
                                  result_descs=[res], compress=True)
    d = capi.omm_cpu_deserialize(bk, blob)
    assert len(d.result_descs) == 1
    sd = capi.omm_gpu_get_static_resource_data("STATIC_INDEX_BUFFER")
    assert sd["size"] > 0
    pipe = capi.omm_gpu_create_pipeline(bk)
    assert capi.omm_gpu_get_pipeline_desc(pipe) is not None
    capi.omm_cpu_destroy_texture(bk, tex)
    capi.omm_destroy_baker(bk)


def test_viewer_inspect_and_reuse(tmp_path, capsys):
    """Zoom-to-micro-triangle inspection + OMM-reuse browsing
    (viewer_app.cpp:1114-1216 interactions, headless)."""
    import numpy as np
    import omm_tpu as omm
    from omm_tpu.baker import Baker
    from omm_tpu.viewer import ViewerSession, uv_to_micro_index
    from omm_tpu import bird
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    # two quads with IDENTICAL uv rects -> 4 tris, OMMs reused
    tc = np.array([[0, 0], [0, 1], [1, 0], [1, 1],
                   [0, 0], [0, 1], [1, 0], [1, 1]], np.float32)
    ib = np.array([0, 1, 2, 3, 1, 2, 4, 5, 6, 7, 5, 6], np.uint32)
    desc = omm.BakeInputDesc(texture=tex, tex_coords=tc, index_buffer=ib,
                             index_count=len(ib), max_subdivision_level=4,
                             dynamic_subdivision_scale=0.0)
    res = omm.bake(desc)
    blob = Baker().serialize(input_descs=[desc], result_descs=[res],
                             compress=True)
    vs = ViewerSession(blob)

    groups = vs.reuse_groups()
    assert groups, "circle quad must produce referenced descs"
    # identical quads: every referenced desc serves >= 2 primitives
    assert all(len(prims) >= 2 for _, prims in groups)
    # most-reused first
    sizes = [len(p) for _, p in groups]
    assert sizes == sorted(sizes, reverse=True)
    total = sum(sizes) + sum(1 for i in range(res.index_count)
                             if int(res.index_buffer[i]) < 0)
    assert total == res.index_count

    info = vs.inspect(0, micro=5)
    assert info["primitive"] == 0
    assert info["subdivision_level"] == 4
    assert info["micro_index"] == 5
    assert info["micro_state"] in ("Opaque", "Transparent",
                                   "UnknownOpaque", "UnknownTransparent")
    assert 4 in info["reused_by"] or len(info["reused_by"]) >= 2

    # uv pick: the centroid of micro-tri k must map back to index k
    uv_tri = tc[[0, 1, 2]]
    for k in (0, 7, 42, 255):
        muv = bird.micro_triangle_uvs(uv_tri, np.asarray([k], np.uint32),
                                      4)[0]
        cen = muv.mean(axis=0)
        assert uv_to_micro_index(uv_tri, cen, 4) == k
    info = vs.inspect(0, uv=tuple(
        bird.micro_triangle_uvs(uv_tri, np.asarray([9], np.uint32),
                                4)[0].mean(axis=0)))
    assert info["micro_index"] == 9

    # the state reported must equal the decoded bake state
    from omm_tpu.stats import decode_states
    d = res.desc_array[int(res.index_buffer[0])]
    st = decode_states(res.array_data, d.offset, d.subdivision_level,
                       d.format)
    got = vs.inspect(0, micro=3)["micro_state"]
    assert got == omm.OpacityState(int(st[3])).name

    # CLI surface
    import omm_tpu.cli as cli
    p = tmp_path / "v.bin"
    p.write_bytes(blob)
    rc = cli.main(["viewer", str(p), "--reuse", "--inspect", "0:5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "distinct OMMs" in out and "micro_state" in out
    rc = cli.main(["viewer", str(p), "--inspect", "1:0.4,0.55"])
    assert rc == 0
    assert "micro_index" in capsys.readouterr().out


@pytest.mark.parametrize("w,h,ok", [
    (64, 100, True), (100, 100, True), (100, 64, True),
    (0, 64, False), (0, 0, False), (65536, 1, True), (65537, 1, False),
])
def test_texture_create_dims(w, h, ok):
    """TextureTest Create* grid (test_basic.cpp:220-277): zero or
    >65536 (texture_impl.h:148) dimensions are INVALID_ARGUMENT."""
    if w * h > 0:
        plane = np.zeros((h, w), np.float32)
    else:
        plane = np.zeros((max(h, 0), max(w, 0)), np.float32)
    if ok:
        tex = omm.Texture([plane], omm.TextureFormat.FP32)
        assert tex.mip_count == 1
    else:
        with pytest.raises(omm.BakeError) as ei:
            omm.Texture([plane], omm.TextureFormat.FP32)
        assert ei.value.result == omm.Result.INVALID_ARGUMENT
