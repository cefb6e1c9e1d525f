"""Profiling helpers: labeled wall/device timing + XLA profiler traces.

TPU-native replacement for the reference's opt-in CUDA-event profiling
(mmdet/utils/profiling.py:1-42 ``profile_time``) and iteration timing
(fcos_core/utils/timer.py): a context manager that blocks on device work
for accurate wall timing, a step-timer for train loops, and wrappers around
``jax.profiler`` for capturing XLA traces viewable in TensorBoard /
Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax


@contextlib.contextmanager
def profile_time(label: str, enabled: bool = True, sync: bool = True,
                 stream=None):
    """Wall-clock a region; with ``sync`` the device queue is drained before
    and after so async dispatch doesn't hide device time.

    Usage::
        with profile_time('decode'):
            out = decode_fn(...)
    """
    if not enabled:
        yield
        return
    if sync:
        jax.effects_barrier()
    t0 = time.perf_counter()
    try:
        with jax.named_scope(label):  # also labels the XLA trace
            yield
    finally:
        if sync:
            jax.effects_barrier()
        ms = (time.perf_counter() - t0) * 1e3
        print(f"{label}: {ms:.2f} ms", file=stream, flush=True)


class StepTimer:
    """Accumulates per-phase times across steps (data/compute/log...)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._open = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: dict(total_s=round(self.totals[k], 4),
                        mean_ms=round(1e3 * self.totals[k]
                                      / max(self.counts[k], 1), 3),
                        count=self.counts[k])
                for k in self.totals}


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace (XPlane) for TensorBoard/Perfetto.

    Equivalent role to nvprof/nsight in the reference's workflow::
        with trace('/tmp/jax-trace'):
            train_step(...)
        # then: tensorboard --logdir /tmp/jax-trace
    """
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.effects_barrier()
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator adding a named_scope so a function shows up labeled in
    profiler traces."""
    def deco(fn):
        def wrapped(*a, **kw):
            with jax.named_scope(name):
                return fn(*a, **kw)
        return wrapped
    return deco
