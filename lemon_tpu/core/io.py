"""Run-output contract utilities.

Preserves the reference's filesystem coordination protocol so that downstream
aggregation (crawling ``**/done`` + ``res.pkl``; notebooks/agg_results.ipynb)
ports unchanged:

- ``args.json``  dumped with Path/numpy-safe encoding (run_lemon.py:86-87)
- ``out.txt`` / ``err.txt`` via a stdout/stderr Tee (lib/utils/utils.py:42-54)
- ``res.pkl``, ``{criteria}_scores.csv``
- ``done`` marker written only on success (run_lemon.py:435-436)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path, PurePath

import numpy as np


class Tee:
    """Duplicate a stream to a file (reference: lib/utils/utils.py:42-54)."""

    def __init__(self, fname, mode: str = "a", stream=None):
        self.stream = stream if stream is not None else sys.stdout
        self.file = open(fname, mode)

    def write(self, message):
        self.stream.write(message)
        self.file.write(message)
        self.flush()

    def flush(self):
        self.stream.flush()
        self.file.flush()


def json_default(obj):
    """JSON encoder covering Path and numpy scalar/array types.

    Mirrors path_serial + NumpyEncoder (lib/utils/utils.py:12-16,91-116).
    """
    if isinstance(obj, PurePath):
        return str(obj)
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.complexfloating):
        return {"real": obj.real, "imag": obj.imag}
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.bool_):
        return bool(obj)
    if isinstance(obj, np.void):
        return None
    raise TypeError(f"Object of type '{type(obj).__name__}' is not JSON serializable")


def dump_args(out_dir: Path, args: dict) -> None:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "args.json", "w") as f:
        json.dump(args, f, default=json_default)


def mark_done(out_dir: Path) -> None:
    with open(Path(out_dir) / "done", "w") as f:
        f.write("done")


def is_done(out_dir: Path) -> bool:
    return (Path(out_dir) / "done").exists()


def redirect_output(out_dir: Path) -> None:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sys.stdout = Tee(out_dir / "out.txt", stream=sys.stdout)
    sys.stderr = Tee(out_dir / "err.txt", stream=sys.stderr)


def env_banner() -> str:
    import jax

    lines = [
        "Environment:",
        f"\tPython: {sys.version.split(' ')[0]}",
        f"\tJAX: {jax.__version__}",
        f"\tBackend: {jax.default_backend()}",
        f"\tDevices: {jax.device_count()}",
        f"\tNumPy: {np.__version__}",
        f"\tNode: {os.uname().nodename}",
    ]
    return "\n".join(lines)


class EarlyStopping:
    """Track the best validation metric and signal when patience runs out.

    Shared utility consolidating the inline early-stop loops of the
    trainers (reference: lib/utils/utils.py:56-88 EarlyStopping; used by
    downstream_captioning.py:268-270 and the classification trainer's
    best-acc loop).

    >>> es = EarlyStopping(patience=3, mode="max")
    >>> for epoch in range(n):
    ...     if es.step(val_acc, params):  # True => new best, payload kept
    ...         ...
    ...     if es.should_stop:
    ...         break
    >>> best_params, best_metric = es.best_payload, es.best
    """

    def __init__(self, patience: int, mode: str = "max"):
        assert mode in ("max", "min")
        self.patience = patience
        self.mode = mode
        self.best = -np.inf if mode == "max" else np.inf
        self.best_payload = None
        self.since_best = 0

    def seed(self, metric, payload) -> None:
        """Set the starting best without consuming patience (e.g. the
        untrained params, so an entirely non-improving run still returns
        a payload)."""
        self.best = metric
        self.best_payload = payload
        self.since_best = 0

    def step(self, metric, payload=None) -> bool:
        improved = metric > self.best if self.mode == "max" else metric < self.best
        if improved:
            self.best = metric
            if payload is not None:
                # an improving step WITHOUT a payload keeps the previous
                # snapshot (e.g. seed()'s) rather than clobbering it with
                # None — best_payload must never regress to nothing
                self.best_payload = payload
            self.since_best = 0
        else:
            self.since_best += 1
        return improved

    @property
    def should_stop(self) -> bool:
        return self.since_best >= self.patience
