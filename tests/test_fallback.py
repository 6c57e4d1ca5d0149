"""Kernel fallback policy: narrow, observable, never silent.

VERDICT r1 weak #2: blanket `except Exception` could hide a real kernel
bug in a silent 10x perf drop.  The policy now catches only known
toolchain gaps (kernels/fallback.KERNEL_FALLBACK_ERRORS), records each
event, and emits KernelFallbackWarning; everything else propagates.
"""
import numpy as np
import pytest

import omm_tpu as omm
from omm_tpu import engine
from omm_tpu.kernels import fallback as fb

from fixtures import standard_circle


def _cfg():
    return engine.ResampleConfig(
        addr_mode=omm.TextureAddressMode.Clamp,
        filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
        border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)


def _items(n, M, seed=23):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        b = rng.rand(2).astype(np.float32) * 0.2
        t = np.array([b + [0.06, 0.09], b + [0.13, 0.68],
                      b + [0.71, 0.58]], np.float32)
        out.append((t, np.full(M, 3, np.uint8)))
    return out


def test_fast_path_has_zero_fallbacks():
    """Normal batch through the two-phase engine: no fallback events."""
    from omm_tpu.kernels import twophase as tp

    fb.reset()
    tex = omm.Texture([standard_circle(96, 96)], omm.TextureFormat.FP32)
    subdiv = 4
    M = omm.get_num_micro_triangles(subdiv)
    items = _items(2, M)
    got = tp.classify_work_items_batch(tex, _cfg(), items, subdiv)
    assert fb.count() == 0, fb.events()
    for (t, _), st in zip(items, got):
        want = engine.resample_fine_item(tex, _cfg(), t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st == want).all()


def test_broken_kernel_warns_and_falls_back(monkeypatch):
    """A deliberately-broken exact kernel surfaces KernelFallbackWarning
    and a recorded event — and the batch still classifies bit-exactly
    through the slow path."""
    from omm_tpu.kernels import pallas_classify as pk
    from omm_tpu.kernels import twophase as tp

    def boom(*a, **k):
        raise NotImplementedError("deliberately broken kernel (test)")

    monkeypatch.setattr(pk, "_run_v3", boom)
    fb.reset()
    # fresh texture/shape so no cached jit executable bypasses the break
    tex = omm.Texture([standard_circle(80, 80)], omm.TextureFormat.FP32)
    subdiv = 4
    M = omm.get_num_micro_triangles(subdiv)
    items = _items(2, M, seed=29)
    with pytest.warns(fb.KernelFallbackWarning):
        got = tp.classify_work_items_batch(tex, _cfg(), items, subdiv)
    assert fb.count() > 0
    assert any("twophase" in site for site, _ in fb.events())
    for (t, _), st in zip(items, got):
        want = engine.resample_fine_item(tex, _cfg(), t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (st == want).all()
    fb.reset()


def test_unexpected_error_propagates(monkeypatch):
    """Non-toolchain errors must NOT be swallowed by the fallback."""
    from omm_tpu.kernels import pallas_classify as pk
    from omm_tpu.kernels import twophase as tp

    def bug(*a, **k):
        raise ZeroDivisionError("genuine kernel bug (test)")

    monkeypatch.setattr(pk, "_run_v3", bug)
    fb.reset()
    tex = omm.Texture([standard_circle(72, 72)], omm.TextureFormat.FP32)
    subdiv = 4
    M = omm.get_num_micro_triangles(subdiv)
    items = _items(1, M, seed=31)
    with pytest.raises(ZeroDivisionError):
        tp.classify_work_items_batch(tex, _cfg(), items, subdiv)
    assert fb.count() == 0
    fb.reset()


def test_lowering_exception_type_resolved():
    """The Mosaic LoweringException lives in a private jax module that
    can move across versions; if it silently vanished from
    KERNEL_FALLBACK_ERRORS, a real toolchain lowering gap would crash
    bake() instead of rerouting to the slow path.  Fail loudly here so
    a jax upgrade gets a deliberate fix (add the new module path to
    fallback._types resolution)."""
    from omm_tpu.kernels import fallback as fb
    assert fb.LOWERING_EXC_RESOLVED, \
        "LoweringException not found in any known jax module path"
    names = [t.__name__ for t in fb.KERNEL_FALLBACK_ERRORS]
    assert "LoweringException" in names


def test_event_log_is_bounded():
    """Farm workers on a permanently-falling-back toolchain must not
    leak memory through the event log (bounded tail + total counter)."""
    import warnings
    from omm_tpu.kernels import fallback as fb
    fb.reset()
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for k in range(1000):
                fb.record(f"site{k}", RuntimeError("x" * 100))
        assert fb.count() == 1000
        ev = fb.events()
        assert len(ev) == 256
        assert ev[-1][0] == "site999" and ev[0][0] == "site744"
    finally:
        fb.reset()
