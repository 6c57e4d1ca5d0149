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

import collections
import warnings

_types: list[type] = [NotImplementedError]

#: True when the Mosaic LoweringException type was found.  It lives in a
#: private jax module that can move across versions; a unit test asserts
#: this flag so a jax upgrade that relocates it fails LOUDLY instead of
#: silently narrowing the fallback tuple (the primary motivating case).
LOWERING_EXC_RESOLVED = False
for _mod in ("jax._src.pallas.mosaic.lowering",
             "jax.experimental.pallas.mosaic.lowering",
             "jax._src.pallas.mosaic_lowering"):
    try:
        import importlib

        LoweringException = getattr(importlib.import_module(_mod),
                                    "LoweringException")
        _types.append(LoweringException)
        LOWERING_EXC_RESOLVED = True
        break
    except (ImportError, AttributeError):  # pragma: no cover
        continue
try:
    import jax.errors
    _types.append(jax.errors.JaxRuntimeError)
except ImportError:  # pragma: no cover
    pass

#: Exception types that are allowed to trigger a slow-path fallback.
KERNEL_FALLBACK_ERRORS = tuple(_types)


class KernelFallbackWarning(UserWarning):
    """A device kernel was rerouted to the slow path (toolchain gap)."""


# Bounded event log: long-lived farm workers on a permanently-falling-
# back toolchain record one event per batch forever; keep the recent
# tail plus a total counter.
_events: collections.deque = collections.deque(maxlen=256)
_total = 0


def record(site: str, exc: BaseException) -> None:
    """Record one fallback event and emit an observable warning (the
    analog of Logger.perf_warn for the below-Baker kernel layer)."""
    global _total
    reason = f"{type(exc).__name__}: {exc}"
    _events.append((site, reason))
    _total += 1
    warnings.warn(
        f"omm_tpu device kernel fallback at {site}: {reason} "
        f"(rerouted to the XLA-gather slow path)",
        KernelFallbackWarning, stacklevel=3)


def count() -> int:
    return _total


def events() -> list[tuple[str, str]]:
    """The most recent fallback events (bounded tail, newest last)."""
    return list(_events)


def reset() -> None:
    global _total
    _events.clear()
    _total = 0
