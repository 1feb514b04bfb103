"""Tracing and phase timing.

The reference instruments wall-clock only (datetime bracketing +
runtime.npy, SURVEY.md §5). Here:

- :class:`PhaseTimer` — named phase accumulation feeding the structured
  timing dict every pipeline prints/saves.
- :func:`trace` — optional ``jax.profiler`` trace context (XPlane dumps
  viewable in TensorBoard/XProf), enabled via LEMON_TPU_TRACE_DIR.
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` passthrough so
  pipeline phases show up on the device timeline.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from pathlib import Path
from typing import Dict, Iterator


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        with annotate(name):
            yield
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)

    def save(self, path) -> None:
        Path(path).write_text(json.dumps(self.as_dict()))


@contextlib.contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(out_dir=None):
    """Device trace around a block; no-op unless a directory is given or
    LEMON_TPU_TRACE_DIR is set."""
    import jax

    out_dir = out_dir or os.environ.get("LEMON_TPU_TRACE_DIR")
    if not out_dir:
        yield
        return
    jax.profiler.start_trace(str(out_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
