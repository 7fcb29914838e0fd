"""Lightweight profiling/observability hooks.

The reference's only observability is a tqdm loss postfix (SURVEY §5.1).
Here: per-step wall timing with compile-step exclusion, a throughput
summary, and a context manager around ``jax.profiler`` traces for deep
dives (view with TensorBoard or xprof on the trace directory).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax


@dataclass
class StepTimer:
    """Accumulates per-step wall times; first ``skip`` steps (compilation)
    are excluded from the summary statistics."""

    skip: int = 1
    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def steady(self) -> List[float]:
        return self.times[self.skip:]

    def summary(self, items_per_step: Optional[int] = None) -> dict:
        steady = self.steady or self.times
        mean = sum(steady) / max(len(steady), 1)
        out = {
            "steps": len(self.times),
            "mean_s": mean,
            "min_s": min(steady, default=0.0),
            "max_s": max(steady, default=0.0),
        }
        if items_per_step and mean > 0:
            out["items_per_sec"] = items_per_step / mean
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/prof"): ...`` captures a jax.profiler trace
    (host + device timelines) for offline inspection."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def honest_sync(x) -> float:
    """Force REAL device completion by reading a value derived from ``x``.

    ``jax.block_until_ready`` is not a reliable barrier on every backend: on
    the tunneled ``axon`` TPU it returns before device execution finishes
    (measured: an ~82 ms kernel "completes" in 0.05 ms under
    block_until_ready, BASELINE.md "Measurement honesty"). A device->host
    transfer of a scalar that depends on the computation cannot lie."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jax.numpy.ravel(leaf)[0])


def timed_steps(step_fn, state, batches, skip: int = 1):
    """Run ``step_fn`` over ``batches`` with device-synchronized timing.

    Returns (final_state, losses, StepTimer). Each step syncs by READING its
    loss (see ``honest_sync``) so the timer measures real device time, not
    dispatch time.
    """
    timer = StepTimer(skip=skip)
    losses = []
    for batch in batches:
        with timer:
            state, loss = step_fn(state, batch)
            losses.append(float(loss))
    return state, losses, timer
