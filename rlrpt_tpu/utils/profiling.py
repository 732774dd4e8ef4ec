"""Profiling / tracing hooks.

The reference times phases with std::chrono behind a compile-time TIMING
flag (deep_learning_settings.h:20, neural_q_pathtracer.cu:281-284) and
frames with SDL_GetTicks (main.cu:43-49).  TPU equivalents:

* `host_fence` — a reliable completion fence: over a tunnelled backend
  (axon) `block_until_ready` can return while work is still queued, so
  the only dependable fence is materialising a host value that
  data-depends on the output;
* `phase_timer` — wall-clock a named phase, fenced with host_fence (the
  std::chrono equivalent that is correct under async dispatch);
* `trace` — wrap a region in a jax.profiler trace (view in TensorBoard /
  xprof);
* `RaysPerSecond` — the rays/sec/chip counter used by bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


def host_fence(tree) -> float:
    """Wait for every array in `tree` by materialising a dependent scalar.

    `block_until_ready` is not a reliable fence over the axon tunnel (it
    can return while execution is still queued remotely); fetching a host
    value that data-depends on the output is.  The probe reads one element
    per leaf, so the device cost is negligible and there is exactly one
    host round-trip.  Returns the probe sum (useful to defeat DCE).
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if isinstance(l, jax.Array) and l.size]
    if not leaves:
        return 0.0
    return float(sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves))


@contextlib.contextmanager
def phase_timer(name: str, result: Optional[object] = None,
                verbose: bool = True) -> Iterator[dict]:
    """Times a phase; fences on `out['value']` if the body sets it."""
    out: dict = {}
    t0 = time.perf_counter()
    yield out
    if "value" in out:
        host_fence(out["value"])
    out["seconds"] = time.perf_counter() - t0
    if verbose:
        print(f"{name}: {out['seconds']:.3f}s")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace region -> TensorBoard-readable dump."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RaysPerSecond:
    """Accumulates traced-ray counts + wall time -> rays/sec/chip."""

    def __init__(self) -> None:
        self.rays = 0.0
        self.seconds = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, rays: float) -> None:
        assert self._t0 is not None, "start() first"
        self.seconds += time.perf_counter() - self._t0
        self.rays += rays
        self._t0 = None

    @property
    def value(self) -> float:
        return self.rays / self.seconds if self.seconds else 0.0

    def per_chip(self, n_chips: int = 1) -> float:
        return self.value / max(n_chips, 1)
