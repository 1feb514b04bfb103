"""Sweep orchestrator state machine + daemon auto-relaunch.

The reference's sweep.py (sweep.py:56-72,143-173) derives job state from
the filesystem and relaunches crashed jobs only when re-invoked by hand;
the daemon mode with a per-job retry budget is our capability upgrade.
"""

from pathlib import Path

import pytest

from lemon_tpu.cli import launchers
from lemon_tpu.cli.sweep import Job, JobState, run_daemon


def make_jobs(tmp_path, n=3):
    return [Job("lemon_tpu.cli.run_lemon", {"dataset": "synthetic", "seed": i}, tmp_path) for i in range(n)]


def test_job_state_transitions(tmp_path):
    (job,) = make_jobs(tmp_path, 1)
    assert job.state() == JobState.NOT_LAUNCHED
    job.output_dir.mkdir(parents=True)
    assert job.state() == JobState.INCOMPLETE
    (job.output_dir / "job_id").write_text("123")
    assert job.state({"123"}) == JobState.RUNNING
    assert job.state({"999"}) == JobState.INCOMPLETE
    (job.output_dir / "done").write_text("done")
    assert job.state({"123"}) == JobState.DONE


def test_attempts_persist_and_gate_failed_state(tmp_path):
    (job,) = make_jobs(tmp_path, 1)
    assert job.attempts == 0
    job.record_attempt()
    job.record_attempt()
    assert job.attempts == 2
    # Re-built job (fresh process analog) sees the same count.
    (job2,) = make_jobs(tmp_path, 1)
    assert job2.attempts == 2
    assert job2.state(retry_budget=3) == JobState.INCOMPLETE
    assert job2.state(retry_budget=2) == JobState.FAILED
    # retry_budget=None (plain launch path) never reports FAILED.
    assert job2.state() == JobState.INCOMPLETE


def test_daemon_retries_flaky_and_fails_hopeless(tmp_path, monkeypatch):
    jobs = make_jobs(tmp_path, 3)
    flaky, easy, hopeless = jobs

    def fake_launcher(commands):
        # _launch recorded the attempt before invoking us; simulate the
        # child process finishing (or crashing) synchronously.
        for _cmd, out_dir in commands:
            d = Path(out_dir)
            if d == easy.output_dir:
                (d / "done").write_text("done")
            elif d == flaky.output_dir and flaky.attempts >= 3:
                (d / "done").write_text("done")
            # hopeless: never writes done

    monkeypatch.setitem(launchers.REGISTRY, "fake", fake_launcher)
    counts = run_daemon(jobs, "fake", retry_budget=4, poll_interval=0, max_rounds=20)
    assert flaky.state() == JobState.DONE  # succeeded on its third attempt
    assert easy.state() == JobState.DONE
    assert hopeless.state(retry_budget=4) == JobState.FAILED
    assert hopeless.attempts == 4  # budget respected, not relaunched forever
    assert counts == {JobState.DONE: 2, JobState.FAILED: 1}


def test_embedding_cache_excluded_from_identity(tmp_path):
    """--embedding_cache is injected into the command of cache-capable
    scripts but never into the run-identity md5: a cached sweep must share
    (and resume) the run dirs of an uncached one."""
    from lemon_tpu.cli.sweep import build_jobs

    plain = build_jobs("synthetic_smoke", tmp_path)
    cached = build_jobs("synthetic_smoke", tmp_path, embedding_cache=str(tmp_path / "c"))
    assert [j.run_id for j in plain] == [j.run_id for j in cached]
    assert all("--embedding_cache" in j.command for j in cached)
    assert all("--embedding_cache" not in j.command for j in plain)
    # the baseline family shares the same content-keyed cache
    # (discrepancy_baseline runs lemon_tpu.cli.run_baseline)
    base = build_jobs("discrepancy_baseline", tmp_path, embedding_cache=str(tmp_path / "c"))
    assert all("--embedding_cache" in j.command for j in base)
    # but training CLIs don't take the flag
    train = build_jobs("cc3m_clip_scratch", tmp_path, embedding_cache=str(tmp_path / "c"))
    assert all("--embedding_cache" not in j.command for j in train)


def test_daemon_max_rounds_stops_early(tmp_path, monkeypatch):
    jobs = make_jobs(tmp_path, 1)

    def never_done(commands):
        pass

    monkeypatch.setitem(launchers.REGISTRY, "fake2", never_done)
    run_daemon(jobs, "fake2", retry_budget=100, poll_interval=0, max_rounds=2)
    assert jobs[0].attempts == 2  # initial round + 1 bounded round, then stop
