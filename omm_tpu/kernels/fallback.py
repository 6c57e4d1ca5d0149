"""Observable, narrow fallback policy for device-kernel dispatch.

A device-kernel dispatch may legitimately fail only for a known set of
toolchain reasons — Mosaic lowering gaps (missing rules raise
NotImplementedError / LoweringException) or backend compile failures
(JaxRuntimeError).  Those reroute to the XLA-gather slow path WITH a
recorded reason and a Python warning; anything else propagates so a real
kernel bug surfaces instead of vanishing into a silent 10x perf drop.

Tests assert `count() == 0` on the fast path and `count() > 0` (plus the
warning) when a kernel is deliberately broken.
"""
from __future__ import annotations

import warnings

_types: list[type] = [NotImplementedError]
try:
    from jax._src.pallas.mosaic.lowering import LoweringException
    _types.append(LoweringException)
except ImportError:  # pragma: no cover - older/newer jax layouts
    pass
try:
    import jax.errors
    _types.append(jax.errors.JaxRuntimeError)
except ImportError:  # pragma: no cover
    pass

#: Exception types that are allowed to trigger a slow-path fallback.
KERNEL_FALLBACK_ERRORS = tuple(_types)


class KernelFallbackWarning(UserWarning):
    """A device kernel was rerouted to the slow path (toolchain gap)."""


_events: list[tuple[str, str]] = []


def record(site: str, exc: BaseException) -> None:
    """Record one fallback event and emit an observable warning (the
    analog of Logger.perf_warn for the below-Baker kernel layer)."""
    reason = f"{type(exc).__name__}: {exc}"
    _events.append((site, reason))
    warnings.warn(
        f"omm_tpu device kernel fallback at {site}: {reason} "
        f"(rerouted to the XLA-gather slow path)",
        KernelFallbackWarning, stacklevel=3)


def count() -> int:
    return len(_events)


def events() -> list[tuple[str, str]]:
    return list(_events)


def reset() -> None:
    _events.clear()
