"""Structured timing and device-profiler hooks (SURVEY.md §5 tracing).

The reference only has coarse wall-clock prints (`stopwatch` alias of
time.time at core.py:140,190,210-213 and gpmcmc.py:590-597).  We keep
that user-visible "Time taken" UX, but every timed section also lands in
a process-level registry so workflows can be profiled programmatically,
and ``device_profile`` wraps the JAX profiler for kernel-level traces
(TensorBoard/Perfetto) on TPU.
"""

from __future__ import annotations

from collections import defaultdict
from contextlib import contextmanager
from time import perf_counter

__all__ = [
    "stopwatch", "timings", "reset_timings", "summary", "device_profile",
]

_REGISTRY: dict = defaultdict(list)


@contextmanager
def stopwatch(name: str, verbose: bool = False):
    """Time a section: records into the registry; with verbose=True also
    prints the reference's "Time taken: X s" line."""
    t0 = perf_counter()
    try:
        yield
    finally:
        dt = perf_counter() - t0
        _REGISTRY[name].append(dt)
        if verbose:
            print(f"Time taken: {dt:0.2f} s")


def record(name: str, dt: float) -> None:
    """Record an externally-measured duration (for call sites that need
    to interleave their own prints with the measurement)."""
    _REGISTRY[name].append(dt)


def timings() -> dict:
    """All recorded durations: {section: (dt, ...)} in seconds."""
    return {k: tuple(v) for k, v in _REGISTRY.items()}


def reset_timings() -> None:
    _REGISTRY.clear()


def summary() -> str:
    """One line per section: calls, total, mean."""
    lines = []
    for k in sorted(_REGISTRY):
        v = _REGISTRY[k]
        tot = sum(v)
        lines.append(
            f"{k}: n={len(v)} total={tot:0.3f}s mean={tot / len(v):0.3f}s")
    return "\n".join(lines)


@contextmanager
def device_profile(logdir: str):
    """JAX profiler trace around a block — kernel-level TPU timelines,
    viewable in TensorBoard/Perfetto.  No-ops cleanly if the profiler is
    unavailable on the backend."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
