"""omm_tpu — TPU-native Opacity Micro-Map baking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
NVIDIA-RTX/OMM SDK (reference v1.9.0): converts alpha-tested triangle
meshes into per-triangle opacity micromaps (OC1 2/4-state) for ray-tracing
any-hit culling.  One classification engine with numpy (oracle), jax and
pallas backends replaces the reference's separate CPU and GPU bakers.

Quick start:

    import numpy as np
    import omm_tpu as omm

    tex = omm.Texture([alpha_plane_f32], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=uv_array,            # (V, 2) float32
        index_buffer=indices,           # (3T,) uint32
        index_count=len(indices),
        max_subdivision_level=6,
    )
    result = omm.bake(desc)
    stats = omm.get_stats(result)
"""

from .types import (AlphaMode, BakeError, BakeFlags, BakeInputDesc,
                    BakeResult, DebugStats, Format, IndexFormat, MicromapDesc,
                    OpacityState, Result, SamplerDesc, SpecialIndex,
                    TexCoordFormat, TextureAddressMode, TextureFilterMode,
                    TextureFlags, TextureFormat, UnknownStatePromotion,
                    UsageCount, get_bit_count, get_num_micro_triangles,
                    MAX_SUBDIV_LEVEL)
from .texture import Texture
from .bake import bake
from .stats import get_stats, collect_stats, decode_states
from .baker import Baker
from .log import Logger, MessageSeverity

LIBRARY_VERSION = (1, 9, 0)  # capability parity target (omm.h:17-19)

__all__ = [
    "AlphaMode", "BakeError", "BakeFlags", "BakeInputDesc", "BakeResult",
    "DebugStats", "Format", "IndexFormat", "MicromapDesc", "OpacityState",
    "Result", "SamplerDesc", "SpecialIndex", "TexCoordFormat",
    "TextureAddressMode", "TextureFilterMode", "TextureFlags",
    "TextureFormat", "UnknownStatePromotion", "UsageCount", "Texture",
    "bake", "get_stats", "collect_stats", "decode_states", "get_bit_count",
    "get_num_micro_triangles", "MAX_SUBDIV_LEVEL", "LIBRARY_VERSION",
    "Baker", "Logger", "MessageSeverity",
]
