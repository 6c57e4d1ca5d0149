"""The documentation example as a test (test_minimal_sample.cpp:17-158):
a donut alpha texture under a 4-triangle diamond with mixed per-triangle
subdivision levels, 2-state output."""
import numpy as np

import omm_tpu as omm
from omm_tpu.baker import Baker


def test_minimal_sample_cpu(tmp_path):
    r_min, r_max = 0.2, 0.3
    n = 256
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    u = i.astype(np.float32) / np.float32(n)
    v = j.astype(np.float32) / np.float32(n)
    r = np.sqrt((u - np.float32(0.5)) ** 2 + (v - np.float32(0.5)) ** 2)
    alpha = ((r > np.float32(r_min)) & (r < np.float32(r_max))).astype(
        np.float32)

    tex_coords = np.array([[0.05, 0.50], [0.50, 0.05], [0.50, 0.50],
                           [0.95, 0.50], [0.50, 0.95]], np.float32)
    indices = np.array([0, 1, 2, 1, 3, 2, 3, 4, 2, 2, 4, 0], np.uint32)
    subdivision_levels = np.array([2, 3, 4, 5], np.uint8)

    messages = []
    baker = Baker(lambda sev, m: messages.append(m))
    tex = baker.create_texture([alpha], omm.TextureFormat.FP32)

    desc = omm.BakeInputDesc(
        texture=tex,
        bake_flags=omm.BakeFlags.EnableValidation,
        alpha_cutoff=0.5,
        alpha_mode=omm.AlphaMode.Test,
        runtime_sampler=omm.SamplerDesc(
            addressing_mode=omm.TextureAddressMode.Clamp,
            filter=omm.TextureFilterMode.Linear),
        tex_coord_format=omm.TexCoordFormat.UV32_FLOAT,
        tex_coords=tex_coords,
        index_buffer=indices,
        index_count=len(indices),
        subdivision_levels=subdivision_levels,
        format=omm.Format.OC1_2_State,
        unknown_state_promotion=omm.UnknownStatePromotion.ForceOpaque,
        dynamic_subdivision_scale=0.0)

    res = baker.bake(desc)
    assert res.index_count == 4
    # every primitive classified at its requested level
    lvls = sorted(res.desc_array[v].subdivision_level
                  for v in res.index_buffer if v >= 0)
    assert lvls == [lvl for i, lvl in enumerate([2, 3, 4, 5])
                    if int(res.index_buffer[i]) >= 0]
    # 2-state output: no unknown states anywhere
    s = baker.get_stats(res)
    assert s.total_unknown_opaque == 0 and s.total_unknown_transparent == 0
    assert s.total_opaque > 0 and s.total_transparent > 0

    # consume data: renderer-facing packaging
    from omm_tpu.integration import to_d3d12_build_inputs, dump_debug_compare
    d3d = to_d3d12_build_inputs(res)
    assert len(d3d.input_buffer) == res.array_data.size
    s1, s2, equal = dump_debug_compare(desc, res)
    assert equal

    # visualize
    files = baker.save_as_images(desc, res, str(tmp_path),
                                 file_postfix="minimal")
    assert files
