"""Readback walkthrough + debugging cookbook — runnable companion to
integration-guide sections 9b (histogram readback -> OMM-array/BLAS build)
and 14 (validation & debugging).

Mirrors the reference guide's "Step 3: Read back and build BLAS + OMM
Array" (reference docs/integration_guide.md:753-755): the dispatch-chain
outputs OUT_OMM_DESC_ARRAY_HISTOGRAM / OUT_OMM_INDEX_HISTOGRAM are read
back to the host and translated into the usage-count structs that the
D3D12 / Vulkan micromap + BLAS prebuild calls take verbatim.

Run:  python examples/readback_and_debug.py [outdir]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import omm_tpu as omm  # noqa: E402
from omm_tpu import gpu  # noqa: E402
from omm_tpu import debug as dbg  # noqa: E402
from omm_tpu import serialize as ser  # noqa: E402
from omm_tpu.stats import get_stats  # noqa: E402


def leaf_texture(n=256):
    """A lobed 'leaf' alpha mask with a soft edge — enough contour to
    produce every state class."""
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    u = (i.astype(np.float32) / n - 0.5) * 2.2
    v = (j.astype(np.float32) / n - 0.5) * 2.2
    r = np.sqrt(u * u + v * v)
    theta = np.arctan2(v, u)
    lobe = 0.72 + 0.25 * np.cos(3.0 * theta)
    return np.clip((lobe - r) * 6.0, 0.0, 1.0).astype(np.float32)


def quad_mesh(cols=4, rows=4):
    uvs, idx = [], []
    for q in range(cols * rows):
        cx, cy = (q % cols) / cols, (q // cols) / rows
        b = len(uvs)
        uvs += [[cx, cy], [cx + 0.9 / cols, cy],
                [cx, cy + 0.9 / rows], [cx + 0.9 / cols, cy + 0.9 / rows]]
        idx += [b, b + 1, b + 2, b + 2, b + 1, b + 3]
    return (np.asarray(uvs, np.float32), np.asarray(idx, np.uint32))


# ---------------------------------------------------------------------------
# Part 1 — deferred (GPU-baker-style) bake + histogram readback
#
# The reference's client executes the dispatch chain on its RHI, then reads
# back two small buffers to size the driver-side builds.  Here the chain
# executes on the JAX device and `execute()` hands back the same artifacts.

def build_inputs_from_histograms(res):
    """Translate the baked histograms into the structures the graphics
    APIs take directly:

    - D3D12: D3D12_RAYTRACING_OPACITY_MICROMAP_ARRAY_DESC.pOmmUsageCounts
      (count/subdivisionLevel/format triplets) for the OMM-array build,
      and D3D12_RAYTRACING_GEOMETRY_OMM_TRIANGLES_DESC.pOmmUsageCounts
      (from the INDEX histogram) for the BLAS attachment.
    - Vulkan: VkMicromapUsageEXT arrays for vkGetMicromapBuildSizesEXT /
      VkAccelerationStructureTrianglesOpacityMicromapEXT.

    The struct layout is identical in both APIs: {count, subdivisionLevel,
    format}."""
    omm_array_usage = [
        {"count": u.count, "subdivisionLevel": u.subdivision_level,
         "format": int(u.format)}
        for u in res.desc_array_histogram]
    blas_attachment_usage = [
        {"count": u.count, "subdivisionLevel": u.subdivision_level,
         "format": int(u.format)}
        for u in res.index_histogram]
    return omm_array_usage, blas_attachment_usage


def part1_deferred_bake_and_readback(tex, uvs, idx):
    cfg = gpu.DispatchConfigDesc(
        alpha_texture=tex, tex_coords=uvs, index_buffer=idx,
        index_count=len(idx), alpha_cutoff=0.5,
        max_subdivision_level=4, dynamic_subdivision_scale=0.0)
    pipe = gpu.Pipeline()

    # Phase B analog: conservative sizes BEFORE running anything — the
    # client allocates output + transient pools from these.
    info = pipe.get_pre_dispatch_info(cfg)
    print(f"pre-dispatch: array<={info.out_omm_array_size_in_bytes}B "
          f"descs<={info.out_omm_desc_size_in_bytes}B "
          f"index={info.out_omm_index_buffer_format.name} "
          f"pools={info.transient_pool_buffer_sizes}")

    # Phase C/D analog: build + execute the dispatch chain.
    chain = pipe.dispatch(cfg, backend="numpy")
    res, post = chain.execute()

    # Step 3 (readback): histograms -> driver build inputs.
    array_usage, blas_usage = build_inputs_from_histograms(res)
    print(f"OMM-array build usage counts:      {array_usage}")
    print(f"BLAS OMM-attachment usage counts:  {blas_usage}")
    print(f"post-dispatch actual sizes: array={post.out_omm_array_size_in_bytes}B "
          f"descs={post.out_omm_desc_size_in_bytes}B")

    # The remaining outputs feed the builds as-is:
    #   res.array_data    -> OMM array build input (ommArrayData)
    #   res.desc_array    -> per-OMM {offset,format,level} descs
    #   res.index_buffer  -> BLAS attachment index buffer (special indices
    #                        < 0 encode fully-uniform triangles)
    #   res.index_format  -> its element format (8/16/32-bit)
    assert post.out_omm_array_size_in_bytes <= info.out_omm_array_size_in_bytes
    assert sum(u["count"] for u in array_usage) == len(res.desc_array)
    n_referenced = int((np.asarray(res.index_buffer) >= 0).sum())
    assert sum(u["count"] for u in blas_usage) == n_referenced
    return res


# ---------------------------------------------------------------------------
# Part 2 — alpha-blended assets
#
# Alpha-BLENDED geometry cannot use opaque hits at all: every intersection
# must accumulate coverage in an any-hit shader.  OMMs still help by
# classifying the fully-transparent regions (skip the any-hit entirely) —
# declare AlphaMode.Blend and keep the 4-state format; Opaque then only
# means "alpha saturates here", and the traversal treats it like unknown
# for shading purposes while transparent micro-triangles are skipped.

def part2_alpha_blend(tex, uvs, idx):
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=uvs, index_buffer=idx, index_count=len(idx),
        alpha_cutoff=0.0,                 # blend: only alpha==0 is skippable
        alpha_mode=omm.AlphaMode.Blend,
        format=omm.Format.OC1_4_State,    # 2-state would drop the unknowns
        max_subdivision_level=4, dynamic_subdivision_scale=0.0)
    res = omm.bake(desc)
    s = get_stats(res)
    known = s.total_opaque + s.total_transparent
    unknown = s.total_unknown_opaque + s.total_unknown_transparent
    print(f"blend-mode bake: skippable(transparent)={s.total_transparent} "
          f"opaque={s.total_opaque} any-hit(unknown)={unknown}")
    assert s.total_transparent > 0, "blend bake found no skippable area"
    return known, unknown


# ---------------------------------------------------------------------------
# Part 3 — validation & debugging cookbook
#
# 1. attach a message callback (validation strings + perf warnings)
# 2. eyeball PNG overlays: one-file first, then per-OMM detailed cutouts
# 3. pin omm.stats totals in tests (the bit-exactness oracle discipline)
# 4. serialize a compressed repro blob for bug reports / the viewer

def part3_debug_cookbook(tex, uvs, idx, outdir):
    messages = []
    from omm_tpu.baker import Baker
    baker = Baker(message_callback=lambda sev, msg:
                  messages.append((sev.name, msg)))
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=uvs, index_buffer=idx, index_count=len(idx),
        alpha_cutoff=0.5, bake_flags=omm.BakeFlags.EnableValidation,
        max_subdivision_level=4, dynamic_subdivision_scale=0.0)
    res = baker.bake(desc)

    # one overlay PNG with every triangle's states over the alpha texture
    files = dbg.save_as_images(desc, res, outdir, file_postfix="overlay")
    # per-OMM cropped closeups with micro-triangle edges (reuse highlighted)
    files += dbg.save_as_images(desc, res, outdir, one_file=False,
                                detailed_cutout=True,
                                file_postfix="cutout",
                                dump_only_first_omm=True)
    print(f"debug PNGs: {files}")

    # stats equality is THE regression oracle — pin these in your tests
    # (use_area=True adds the UV-area-weighted knownAreaMetric, Stats2)
    s = get_stats(res, use_area=True)
    print(f"stats: O={s.total_opaque} T={s.total_transparent} "
          f"UT={s.total_unknown_transparent} UO={s.total_unknown_opaque} "
          f"knownArea={s.known_area_metric:.3f}")

    # compressed repro blob: attach to bug reports; the viewer/CLI and
    # the reference SDK both load it
    blob = baker.serialize(input_descs=[desc], result_descs=[res],
                           compress=True)
    blob_path = os.path.join(outdir, "repro.bin")
    with open(blob_path, "wb") as f:
        f.write(blob)
    print(f"repro blob: {blob_path} ({len(blob)} bytes)")
    d = baker.deserialize(blob)
    assert len(d.result_descs) == 1 and len(d.input_descs) == 1
    assert all(os.path.exists(p) for p in files)
    return files, messages


def main(outdir="/tmp/omm_readback_demo"):
    os.makedirs(outdir, exist_ok=True)
    alpha = leaf_texture(256)
    tex = omm.Texture([alpha], omm.TextureFormat.FP32)
    uvs, idx = quad_mesh(4, 4)

    res = part1_deferred_bake_and_readback(tex, uvs, idx)
    part2_alpha_blend(tex, uvs, idx)
    files, messages = part3_debug_cookbook(tex, uvs, idx, outdir)
    print("OK")
    return res, files, messages


if __name__ == "__main__":
    main(*sys.argv[1:])
