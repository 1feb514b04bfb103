"""Preemption checkpointing for managed clusters.

Counterpart of lib/utils/utils.py:118-147: when running under a scheduler
that grants a per-job scratch dir (Slurm's /checkpoint/$USER/$SLURM_JOB_ID
convention), periodically snapshot {train state, step, rng, early-stop
state} so a preempted job resumes where it left off. Orbax handles the
array state; the small python state rides alongside as JSON.
"""

from __future__ import annotations

import getpass
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional


def preemption_dir() -> Optional[Path]:
    job_id = os.environ.get("SLURM_JOB_ID")
    if job_id is None:
        override = os.environ.get("LEMON_TPU_PREEMPT_DIR")
        return Path(override) if override else None
    base = Path(f"/checkpoint/{getpass.getuser()}/{job_id}")
    return base if base.exists() else None


def has_checkpoint(base: Optional[Path] = None) -> bool:
    base = base or preemption_dir()
    return base is not None and (base / "preempt" / "meta.json").exists()


def save_checkpoint(state, step: int, extra: Dict[str, Any] | None = None, base: Optional[Path] = None) -> bool:
    """Snapshot; returns False when no preemption dir is configured."""
    base = base or preemption_dir()
    if base is None:
        return False
    import orbax.checkpoint as ocp

    target = (base / "preempt").absolute()
    target.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(target / "state") as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    (target / "meta.json").write_text(json.dumps({"step": step, **(extra or {})}))
    return True


def load_checkpoint(abstract_state, base: Optional[Path] = None):
    """Returns (state, meta) or None."""
    base = base or preemption_dir()
    if base is None or not has_checkpoint(base):
        return None
    import orbax.checkpoint as ocp

    target = (base / "preempt").absolute()
    meta = json.loads((target / "meta.json").read_text())
    with ocp.CheckpointManager(target / "state") as mgr:
        state = mgr.restore(
            meta["step"], args=ocp.args.StandardRestore(abstract_state)
        )
    return state, meta
