"""Sweep orchestrator.

Mirrors sweep.py of the reference: every job's output dir is the md5 of its
sorted-args JSON (run identity, sweep.py:27-33); job state is derived from
the filesystem (``done`` => DONE, ``job_id`` + live squeue => RUNNING,
partial output => INCOMPLETE); ``launch`` starts everything not done,
``delete_incomplete`` clears crashed runs for relaunch.

Usage:
    python -m lemon_tpu.cli.sweep launch --experiment synthetic_smoke \
        --output_root out/sweeps --command_launcher local
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shlex
import shutil
import subprocess
import sys
from pathlib import Path
from typing import Dict, List

from lemon_tpu.cli import experiments, launchers


class JobState:
    NOT_LAUNCHED = "not_launched"
    INCOMPLETE = "incomplete"
    RUNNING = "running"
    DONE = "done"


class Job:
    def __init__(self, script: str, args: Dict, output_root: Path):
        self.script = script
        self.args = dict(args)
        canonical = json.dumps(self.args, sort_keys=True)
        self.run_id = hashlib.md5(canonical.encode("utf-8")).hexdigest()
        self.output_dir = Path(output_root) / self.run_id
        self.args["output_dir"] = str(self.output_dir)

    @property
    def command(self) -> str:
        parts = [sys.executable, "-m", self.script]
        for key, val in sorted(self.args.items()):
            if isinstance(val, bool):
                if val:
                    parts.append(f"--{key}")
            elif isinstance(val, (list, tuple)):
                parts.append(f"--{key}")
                parts.extend(str(v) for v in val)
            else:
                parts.append(f"--{key}")
                parts.append(str(val))
        return " ".join(shlex.quote(p) for p in parts)

    def state(self, live_job_ids=None) -> str:
        if (self.output_dir / "done").exists():
            return JobState.DONE
        job_id_file = self.output_dir / "job_id"
        if job_id_file.exists() and live_job_ids is not None:
            if job_id_file.read_text().strip() in live_job_ids:
                return JobState.RUNNING
        if self.output_dir.exists():
            return JobState.INCOMPLETE
        return JobState.NOT_LAUNCHED

    def delete(self) -> None:
        if self.output_dir.exists():
            shutil.rmtree(self.output_dir)


def _live_slurm_ids():
    try:
        import getpass

        out = subprocess.run(
            ["squeue", "-u", getpass.getuser(), "-h", "-o", "%i"],
            capture_output=True, text=True, timeout=30,
        ).stdout
        return {l.strip() for l in out.splitlines() if l.strip()}
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return set()


def build_jobs(experiment: str, output_root: Path) -> List[Job]:
    exp = experiments.get_experiment(experiment)
    return [Job(exp.get_script_name(), hp, output_root) for hp in exp.get_hparams()]


def summarize(jobs: List[Job]) -> Dict[str, int]:
    live = _live_slurm_ids()
    counts: Dict[str, int] = {}
    for job in jobs:
        counts[job.state(live)] = counts.get(job.state(live), 0) + 1
    return counts


def main(argv=None):
    parser = argparse.ArgumentParser(description="lemon_tpu sweep")
    parser.add_argument("command", choices=["launch", "status", "delete_incomplete", "delete_all"])
    parser.add_argument("--experiment", required=True)
    parser.add_argument("--output_root", default="out/sweeps")
    parser.add_argument("--command_launcher", default="local", choices=sorted(launchers.REGISTRY))
    parser.add_argument("--max_slurm_jobs", type=int, default=400)
    parser.add_argument("--slurm_pre", default="")
    parser.add_argument("--yes", action="store_true", help="skip confirmation")
    args = parser.parse_args(argv)

    output_root = Path(args.output_root) / args.experiment
    output_root.mkdir(parents=True, exist_ok=True)
    jobs = build_jobs(args.experiment, output_root)
    print(f"{args.experiment}: {len(jobs)} jobs; states: {summarize(jobs)}")

    if args.command == "status":
        return

    if args.command in ("delete_incomplete", "delete_all"):
        live = _live_slurm_ids()
        targets = [
            j for j in jobs
            if (args.command == "delete_all" and j.state(live) != JobState.NOT_LAUNCHED)
            or (args.command == "delete_incomplete" and j.state(live) == JobState.INCOMPLETE)
        ]
        if not args.yes:
            reply = input(f"delete {len(targets)} runs under {output_root}? [y/N] ")
            if reply.lower() != "y":
                return
        for j in targets:
            j.delete()
        print(f"deleted {len(targets)}")
        return

    live = _live_slurm_ids()
    to_launch = [j for j in jobs if j.state(live) in (JobState.NOT_LAUNCHED, JobState.INCOMPLETE)]
    if not args.yes and len(to_launch) > 20:
        reply = input(f"launch {len(to_launch)} jobs with '{args.command_launcher}'? [y/N] ")
        if reply.lower() != "y":
            return
    for j in to_launch:
        j.output_dir.mkdir(parents=True, exist_ok=True)
    commands = [(j.command, str(j.output_dir)) for j in to_launch]
    launcher = launchers.REGISTRY[args.command_launcher]
    if args.command_launcher == "slurm":
        launcher(commands, max_slurm_jobs=args.max_slurm_jobs, slurm_pre=args.slurm_pre)
    else:
        launcher(commands)
    print(f"launched {len(commands)} jobs")


if __name__ == "__main__":
    main()
