"""Profiling / tracing hooks.

The reference's observability is wall-clock time.time() spans reported
through the info-dict (tebd_evolution.py:237-257) -- that contract is kept
by the dynamics drivers.  This module adds the structured TPU equivalents
(SURVEY.md section 5): jax.profiler traces and fetch-fenced phase timers
(device_get, because block_until_ready is a no-op through the axon TPU
tunnel).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Named wall-clock spans with device fencing.

    with PhaseTimer() as t:
        with t.phase("evolve"):
            out = step(x)
            t.fence(out)            # block_until_ready before the span ends
    t.report()  -> {"evolve": seconds, ...}
    """

    def __init__(self):
        self.spans: Dict[str, float] = {}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.time() - t0

    @staticmethod
    def fence(x):
        # fetch-sync, not block_until_ready: the latter is a no-op through
        # the axon TPU tunnel (see timed_blocked), which would end spans
        # at dispatch time
        jax.device_get(x)

    def report(self) -> Dict[str, float]:
        return dict(self.spans)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace context (no-op when log_dir is None).

    View with tensorboard / xprof.  Usage:
        with device_trace("/tmp/tc_trace"):
            run_benchmark()
    """
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_blocked(fn, *args, **kwargs):
    """(result, seconds) with a FETCH fence: the result's leaves are pulled
    to host (jax.device_get) before the clock stops.

    block_until_ready is NOT used: through the axon TPU tunnel it is a
    no-op (bench.py and dynamics/tdvp.py document the same), so a
    block-based timer measures async dispatch, not compute.  The fetch is
    the only sync that works on every backend; keep timed results small
    (observables/scalars), not full states, or the transfer pollutes the
    measurement."""
    t0 = time.time()
    out = jax.device_get(fn(*args, **kwargs))
    return out, time.time() - t0
