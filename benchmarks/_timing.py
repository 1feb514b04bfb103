"""Shared tunnel-safe timing helpers for the probe scripts.

On the remote-TPU relay, dispatch-side timing lies (block_until_ready can
return before execution) and bulk fetches crawl, so every measurement (a)
forces execution through a SCALAR fetch and (b) cancels constant
dispatch/fetch overhead with a two-point (small vs large repetition)
measurement. bench.py carries its own private copy so the driver can run
it standalone; the probes share this one.
"""

from __future__ import annotations

import time

import numpy as np


def timed_scalar(fn, *args) -> float:
    """Wall-clock of ``float(fn(*args))`` — the float() forces execution."""
    t0 = time.perf_counter()
    out = float(fn(*args))
    assert np.isfinite(out), out
    return time.perf_counter() - t0


def two_point(fn, small_args, large_args, reps: int = 3) -> float:
    """min-of-``reps`` two-point measurement: seconds attributable to the
    marginal work between the small and large variants (constant dispatch
    and fetch overhead cancels). Compiles both variants first."""
    timed_scalar(fn, *small_args)
    timed_scalar(fn, *large_args)
    t_small = min(timed_scalar(fn, *small_args) for _ in range(reps))
    t_large = min(timed_scalar(fn, *large_args) for _ in range(reps))
    return max(t_large - t_small, 1e-9)
