"""Minimal end-to-end bake — the reference documentation example
(support/tests/test_minimal_sample.cpp:17-158) on the TPU-native API.

A donut alpha texture under a 4-triangle diamond with mixed per-triangle
subdivision levels, baked to OC1 2-state, with stats, a serialized blob
round-trip, and state-overlay PNGs.

Run:  python examples/minimal_sample.py [outdir]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import omm_tpu as omm  # noqa: E402
from omm_tpu import serialize as ser
from omm_tpu.baker import Baker


def main(outdir="/tmp/omm_minimal"):
    # --- alpha texture: a donut ------------------------------------------
    n = 256
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    u = i.astype(np.float32) / np.float32(n)
    v = j.astype(np.float32) / np.float32(n)
    r = np.sqrt((u - np.float32(0.5)) ** 2 + (v - np.float32(0.5)) ** 2)
    alpha = ((r > np.float32(0.2)) & (r < np.float32(0.3))).astype(
        np.float32)

    # --- geometry: 4-triangle diamond, mixed subdivision levels ----------
    tex_coords = np.array([[0.05, 0.50], [0.50, 0.05], [0.50, 0.50],
                           [0.95, 0.50], [0.50, 0.95]], np.float32)
    indices = np.array([0, 1, 2, 1, 3, 2, 3, 4, 2, 2, 4, 0], np.uint32)
    subdivision_levels = np.array([2, 3, 4, 5], np.uint8)

    baker = Baker(lambda sev, msg: print(f"[{sev.name}] {msg}"))
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
        format=omm.Format.OC1_2_State,
        unknown_state_promotion=omm.UnknownStatePromotion.ForceOpaque,
        subdivision_levels=subdivision_levels,
        max_subdivision_level=5,
        dynamic_subdivision_scale=0.0)

    result = baker.bake(desc)  # backend='auto': host for small workloads

    print("descs:", len(result.desc_array),
          "| index format:", result.index_format.name,
          "| array bytes:", result.array_data.size)
    print(omm.get_stats(result))

    # --- serialization round-trip (the asset that travels) ---------------
    blob = ser.serialize(ser.DeserializedDesc(
        input_descs=[desc], result_descs=[result],
        flags=ser.SerializeFlags.COMPRESS))
    back = ser.deserialize(blob)
    assert np.array_equal(back.result_descs[0].array_data,
                          result.array_data)
    print(f"serialized blob: {len(blob)} bytes (LZ4, xxh64-digested)")

    # --- debug overlays ---------------------------------------------------
    from omm_tpu.debug import save_as_images
    paths = save_as_images(desc, result, outdir)
    print("overlay PNGs:", *paths, sep="\n  ")


if __name__ == "__main__":
    main(*sys.argv[1:2])
