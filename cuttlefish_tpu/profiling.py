"""Profiling hooks (SURVEY.md §5: the reference has none beyond `-v`
logging; the TPU build makes JAX profiler traces + per-phase timing
first-class).

Two mechanisms:

- `trace()` wraps a region in `jax.profiler.trace` when a trace directory
  is configured (``CUTTLEFISH_TRACE_DIR`` env var or `set_trace_dir`);
  the resulting TensorBoard/XPlane dump shows per-HLO device time.
  With no directory configured it is a no-op, so `Texture.convert` can
  always run under it.
- `phase()` records wall-clock per named phase into `last_phases`
  (prepare / encode / serialize inside `Texture.convert`), the cheap
  always-on analog the bench harness and tests read.
"""

from __future__ import annotations

import contextlib
import os
import time

_trace_dir: str | None = None
last_phases: dict[str, float] = {}


def set_trace_dir(path: str | None) -> None:
    """Enable (or disable with None) JAX profiler tracing of converts."""
    global _trace_dir
    _trace_dir = path


def _active_dir() -> str | None:
    return _trace_dir or os.environ.get("CUTTLEFISH_TRACE_DIR") or None


@contextlib.contextmanager
def trace(name: str = "convert"):
    """jax.profiler.trace around the block when a trace dir is set."""
    d = _active_dir()
    if not d:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(d, name)):
        yield


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall-clock seconds for `name` into `last_phases`."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        last_phases[name] = last_phases.get(name, 0.0) + (
            time.perf_counter() - t0
        )


def reset_phases() -> None:
    last_phases.clear()
