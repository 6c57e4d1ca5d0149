"""Pallas kernel parity (interpret mode on CPU; the real-chip run is gated
by bench.py's bit-exactness check)."""
import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import engine
from omm_tpu.kernels.levelline import get_state_from_coverage

from fixtures import standard_circle


@pytest.mark.slow
def test_pallas_v3_interpret_parity(monkeypatch):
    import jax.experimental.pallas as plmod
    import omm_tpu.kernels.pallas_classify as pk

    orig = plmod.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pk.pl, "pallas_call", interp)

    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    cfg = engine.ResampleConfig(
        addr_mode=omm.TextureAddressMode.Clamp,
        filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
        border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)
    uv = np.array([[0.1, 0.1], [0.15, 0.9], [0.9, 0.85]], np.float32)
    sub = 4
    M = omm.get_num_micro_triangles(sub)
    jobs = pk.prepare_jobs_v3(tex, cfg, uv, sub)
    assert jobs is not None
    a_b, b_b = pk.run_job_v3(jobs[0])
    above, below = pk.gather_v3(jobs[0], a_b, b_b)
    st = get_state_from_coverage(np, cfg.fmt, cfg.promotion, cfg.cutoff_gt,
                                 cfg.cutoff_le, above, below).astype(np.uint8)
    want = engine.resample_fine_item(tex, cfg, uv, sub,
                                     np.full(M, 3, np.uint8))
    assert (st == want).all()


def test_pallas_schedule_fallbacks():
    """prepare_jobs_v3 must decline unsupported configs."""
    import omm_tpu.kernels.pallas_classify as pk

    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    base = dict(filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
                border_alpha=0.0, fmt=omm.Format.OC1_4_State,
                promotion=omm.UnknownStatePromotion.Nearest,
                cutoff_gt=omm.OpacityState.Opaque,
                cutoff_le=omm.OpacityState.Transparent)
    uv = np.array([[0.1, 0.1], [0.15, 0.9], [0.9, 0.85]], np.float32)

    # Border now rides the fast path UNLESS a seed bilinear footprint
    # leaves the texture (the oracle's clamp-the-sentinel seed quirk).
    cfg = engine.ResampleConfig(addr_mode=omm.TextureAddressMode.Border, **base)
    assert pk.prepare_jobs_v3(tex, cfg, uv, 4) is not None
    crossing = np.array([[-0.2, 0.1], [0.3, 1.2], [1.1, 0.5]], np.float32)
    assert pk.prepare_jobs_v3(tex, cfg, crossing, 4) is None

    cfg = engine.ResampleConfig(addr_mode=omm.TextureAddressMode.Clamp, **base)
    degen = np.array([[0.1, 0.1], [0.2, 0.2], [0.3, 0.3]], np.float32)
    assert pk.prepare_jobs_v3(tex, cfg, degen, 4) is None

    nearest = dict(base)
    nearest["filter"] = omm.TextureFilterMode.Nearest
    cfg = engine.ResampleConfig(addr_mode=omm.TextureAddressMode.Clamp,
                                **nearest)
    assert pk.prepare_jobs_v3(tex, cfg, uv, 4) is None
