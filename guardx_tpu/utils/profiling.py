"""Profiling + numerical-debug hooks.

The reference's observability is wall-clock timers only (TPolicy/TEnv/
TUpdate via time.time(), SURVEY.md §5 — no torch/jax profiler anywhere).
Here:
- ``trace(logdir)``: context manager over jax.profiler.start_trace /
  stop_trace — produces an xprof-compatible trace of the jitted epoch
  (view with tensorboard or xprof).
- ``annotate(name)``: TraceAnnotation for labeling host-side phases inside
  a trace.
- ``step_timer()``: the reference's cheap timer vocabulary as a context
  helper returning elapsed seconds.
- ``enable_nan_debug()``: turns on jax debug_nans/debug_infs — the
  framework-level analogue of the engine's NaN=>done guards
  (reference engine.py:696-699) for tracking a NaN to its kernel.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = '/tmp/guardx_trace'):
    """Profile everything inside the block into an xprof trace dir."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def step_timer(out: dict, key: str):
    """Accumulate wall-clock seconds into out[key] (the reference's
    TPolicy/TEnv/TOther pattern, cpo.py:597-674)."""
    t0 = time.time()
    try:
        yield
    finally:
        out[key] = out.get(key, 0.0) + (time.time() - t0)


def enable_nan_debug(enable: bool = True):
    """jax.debug_nans + debug_infs: fail loudly at the producing op."""
    jax.config.update('jax_debug_nans', enable)
    jax.config.update('jax_debug_infs', enable)
