"""bench.py parent-scheduler tests (no jax, no subprocesses).

The round-5 contract: BENCH_r*.json must record a nonzero headline number
even in the worst measured relay weather (rounds 3 AND 4 captured zero —
VERDICT.md). These tests drive `bench.main()` against a fake clock and a
fake subprocess layer replaying measured relay behaviors (stall-wave
compiles of 315–2858 s and transient `remote_compile` errors, BENCH_NOTES
rounds 4–5) and assert the survival-first schedule lands the headline
field under every scenario. Design under test (commits b2ddbe7, dcc41c4,
8ddea8b + the round-5 fast-fail retry):

- the headline leg runs FIRST and UNCAPPED — every attempt gets all
  remaining budget (killed compiles do not persist server-side, so
  P(landing) = P(one uninterrupted compile fits the budget));
- a non-timeout rc!=0 failure (transient relay error) gets ONE immediate
  retry that resumes from the server compile cache and skips captured
  sub-measurements via LEMON_BENCH_HAVE;
- surplus legs run only after the headline number exists, in
  _SURPLUS_PLAN order (image_int8 first — the only leg that can raise
  the `value` field; e2e before train/knn_500k — it carries four fields
  including the AUROC).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402

BUDGET = 1260.0
RESERVE = bench._RESERVE_S


class FakeClock:
    def __init__(self):
        self.now = 1_000_000.0

    def time(self):
        return self.now

    def sleep(self, s):
        self.now += s

    def perf_counter(self):
        return self.now


class FakeRelay:
    """Replays scripted per-leg attempt behaviors through subprocess.run.

    Script entry per attempt: (duration_s, [stdout json lines], rc) — or
    duration_s > timeout simulates a stall-wave kill: the clock advances by
    the timeout and TimeoutExpired carries whatever lines the leg emitted
    before dying (cumulative-JSON semantics).
    """

    def __init__(self, clock, scripts):
        self.clock = clock
        self.scripts = {k: list(v) for k, v in scripts.items()}
        self.calls = []  # (leg, timeout, have_keys)

    def run(self, cmd, stdout=None, stderr=None, timeout=None, cwd=None, env=None, text=None):
        leg = cmd[cmd.index("--leg") + 1]
        have = frozenset(json.loads((env or {}).get("LEMON_BENCH_HAVE", "[]")))
        self.calls.append((leg, timeout, have))
        if not self.scripts.get(leg):
            raise AssertionError(f"unscripted attempt on leg {leg}")
        duration, lines, rc = self.scripts[leg].pop(0)
        if duration > timeout:
            self.clock.now += timeout
            raise subprocess.TimeoutExpired(cmd, timeout, output="\n".join(lines))
        self.clock.now += duration

        class P:
            pass

        p = P()
        p.stdout = "\n".join(lines)
        p.returncode = rc
        return p


@pytest.fixture()
def sched(monkeypatch):
    clock = FakeClock()
    monkeypatch.setattr(bench, "time", clock)
    monkeypatch.setenv("LEMON_BENCH_BUDGET_S", str(int(BUDGET)))

    def drive(scripts, capsys):
        relay = FakeRelay(clock, scripts)
        monkeypatch.setattr(bench.subprocess, "run", relay.run)
        bench.main()
        final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        return relay, final

    return drive


J = json.dumps
SURPLUS_ORDER = [n for n, _, _ in bench._SURPLUS_PLAN]
HEAD_FULL = [J({"backend": "tpu"}), J({"image_embeddings_per_sec_bf16": 17100.0}),
             J({"image_embeddings_per_sec_bf16": 17100.0, "text_embeddings_per_sec": 21600.0})]
SURPLUS_OK = {
    "image_int8": [(50, [J({"image_embeddings_per_sec_int8_static": 18300.0})], 0)],
    "knn": [(60, [J({"knn_pairs_per_sec": 1.89e10, "knn_pairs_per_sec_bf16x3": 2.66e10})], 0)],
    "e2e": [(120, [J({"e2e_detect_20k_seconds": 29.0, "e2e_detect_20k_warm_seconds": 4.5})], 0)],
    "train_bf16": [(40, [J({"clip_train_pairs_per_sec_bf16": 2680.0})], 0)],
    "knn_500k": [(40, [J({"knn_500k_seconds": 14.6})], 0)],
    "knn_1m": [(60, [J({"knn_1m_seconds": 57.0})], 0)],
}


def test_good_weather_runs_everything(sched, capsys):
    scripts = {"headline": [(100, HEAD_FULL, 0)], **SURPLUS_OK}
    relay, final = sched(scripts, capsys)
    # value = the winner of the two image modes (int8 drifts, bf16 doesn't;
    # bench measures both and headlines the faster — BENCH_NOTES round 3)
    assert final["value"] == 18300.0
    assert final["image_embed_mode"] == "int8_static"
    assert final["vs_baseline"] == pytest.approx(18300.0 / 50000.0)
    assert final["legs_failed"] == [] and final["legs_skipped"] == []
    assert [c[0] for c in relay.calls] == ["headline"] + SURPLUS_ORDER
    # the first headline attempt is UNCAPPED: its timeout is the whole
    # remaining budget, not a staged slice (commit 8ddea8b's measurement)
    assert relay.calls[0][1] == pytest.approx(BUDGET - RESERVE, abs=2)
    # image_int8 runs before every other surplus leg (it alone can raise
    # `value`), and e2e runs before train/knn_500k (four fields incl. AUROC)
    assert SURPLUS_ORDER.index("image_int8") == 0
    assert SURPLUS_ORDER.index("e2e") < SURPLUS_ORDER.index("train_bf16")
    assert SURPLUS_ORDER.index("e2e") < SURPLUS_ORDER.index("knn_500k")


def test_stall_wave_single_long_compile_lands_uncapped(sched, capsys):
    """Round-5 weather: the headline leg's single program compiles for
    1200 s (the observed wave band is 790–2858 s per program). The
    uncapped attempt rides it out and lands the full headline set; every
    surplus leg degrades to a skip — value > 0 is the contract."""
    scripts = {"headline": [(1200, HEAD_FULL, 0)]}
    relay, final = sched(scripts, capsys)
    assert final["value"] == 17100.0
    assert final["image_embed_mode"] == "bf16"
    assert [c[0] for c in relay.calls] == ["headline"]
    assert relay.calls[0][1] == pytest.approx(BUDGET - RESERVE, abs=2)
    assert final["legs_failed"] == []
    assert final["legs_skipped"] == SURPLUS_ORDER


def test_transient_relay_error_immediate_retry_skips_done_measurement(sched, capsys):
    """Round-5 run 1 signature: the leg dies rc!=0 on a transient relay
    error (`remote_compile: response body closed`) AFTER landing the image
    number. The immediate retry resumes from the server compile cache with
    LEMON_BENCH_HAVE carrying the image key, so only text reruns; surplus
    legs then run normally."""
    scripts = {
        "headline": [
            (90, [J({"backend": "tpu"}), J({"image_embeddings_per_sec_bf16": 17000.0})], 1),
            (80, [J({"text_embeddings_per_sec": 21500.0})], 0),
        ],
        **SURPLUS_OK,
    }
    relay, final = sched(scripts, capsys)
    assert final["value"] == 18300.0  # int8 surplus leg wins the mode pick
    assert final["image_embeddings_per_sec_bf16"] == 17000.0
    assert final["text_embeddings_per_sec"] == 21500.0
    assert final["legs_failed"] == []
    headline_calls = [c for c in relay.calls if c[0] == "headline"]
    assert len(headline_calls) == 2
    # the retry attempt carried the already-captured image key
    assert "image_embeddings_per_sec_bf16" in headline_calls[1][2]
    # ... and got the UNUSED cap remainder (first cap − 90 s elapsed),
    # not a second full cap
    assert headline_calls[1][1] == pytest.approx(headline_calls[0][1] - 90, abs=2)


def test_late_transient_failure_does_not_starve_later_legs(sched, capsys):
    """Finding from the round-5 review: a leg that fails rc!=0 near the END
    of its cap must not receive a second full cap (one flaky leg would eat
    ~2x its budget share). With <60 s of its own cap left, the immediate
    retry is skipped entirely and the leg falls through to the Phase-3
    pass; every later leg still runs."""
    scripts = {
        "headline": [(100, HEAD_FULL, 0)],
        **SURPLUS_OK,
        # e2e dies rc!=0 at 590 s of its 600 s cap -> unused remainder 10 s
        # < 60 s -> no immediate retry; Phase 3 retries it with budget share
        "e2e": [
            (590, [J({"e2e_detect_20k_seconds": 30.0})], 1),
            (50, [J({"e2e_detect_20k_warm_seconds": 4.5})], 0),
        ],
    }
    relay, final = sched(scripts, capsys)
    e2e_calls = [c for c in relay.calls if c[0] == "e2e"]
    assert len(e2e_calls) == 2  # the second is the Phase-3 retry
    # the legs AFTER e2e in the surplus plan all still ran
    for name in SURPLUS_ORDER[SURPLUS_ORDER.index("e2e") + 1:]:
        assert name in [c[0] for c in relay.calls]
    assert final["legs_failed"] == []
    assert final["e2e_detect_20k_warm_seconds"] == 4.5


def test_headline_timeout_keeps_cumulative_value(sched, capsys):
    """A stall-wave compile LONGER than the whole budget: the uncapped
    attempt is killed at the budget, but cumulative-JSON semantics keep
    whatever the leg emitted before dying — here the image number, i.e.
    the `value` field survives even this worst case. No retry fires (a
    timeout means the budget is gone and killed compiles don't persist)."""
    scripts = {
        "headline": [
            (10_000, [J({"backend": "tpu"}), J({"image_embeddings_per_sec_bf16": 16900.0})], 1),
        ],
    }
    relay, final = sched(scripts, capsys)
    assert final["value"] == 16900.0
    assert [c[0] for c in relay.calls] == ["headline"]
    assert "headline" in final["legs_failed"]  # text never landed
    assert final["legs_skipped"] == SURPLUS_ORDER


def test_fast_code_failure_does_not_spin(sched, capsys):
    """A leg that dies instantly with rc!=0 (import error, not weather)
    must not eat the budget in a retry spin: each survival attempt costs
    at most two runs (the attempt + its one immediate retry), the
    quick-failure guard stops the survival loop after two attempts, and
    the Phase-3 retry pass adds one more attempt (two runs)."""
    scripts = {
        "headline": [(5, [J({"backend": "tpu"})], 1)] * 6,
        **SURPLUS_OK,
    }
    relay, final = sched(scripts, capsys)
    headline_attempts = [c for c in relay.calls if c[0] == "headline"]
    assert len(headline_attempts) <= 6
    # int8 fallback becomes the headline value
    assert final["value"] == 18300.0
    assert final["image_embed_mode"] == "int8_static"


def test_leg_e2e_retry_skips_cold_and_keeps_cache(monkeypatch, tmp_path, capsys):
    """The e2e leg's retry semantics (round-5 review finding): with the
    cold keys in LEMON_BENCH_HAVE the leg must NOT delete the stable
    embedding-cache dir and must run ONLY the warm detection; without
    them it must reset the cache first so cold stays honest."""
    import tempfile

    # _leg_e2e sets LEMON_TPU_PRECISION=bf16 — intended in its production
    # subprocess, but HERE it runs in-process and would leak bf16 numerics
    # into every later test (14 golden-parity tests went red exactly this
    # way, 2026-08-21). setenv registers the original state for teardown
    # restore even though the leg overwrites the value mid-test.
    monkeypatch.setenv("LEMON_TPU_PRECISION", os.environ.get("LEMON_TPU_PRECISION", "fp32"))

    calls = []

    def fake_run_detection(cfg):
        calls.append(cfg.embedding_cache)
        return {
            "agg_results": {"know_val_labels": {"test": {"AUROC": 0.96}}},
            "phase_timing": {"knn_search": 0.3, "components": 0.4},
        }

    import lemon_tpu.detect as detect

    monkeypatch.setattr(detect, "run_detection", fake_run_detection)
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    cache_dir = tmp_path / "lemon_bench_emb_cache"
    sentinel = cache_dir / "prior_attempt.npz"
    sentinel.parent.mkdir(parents=True)
    sentinel.write_bytes(b"x")

    # retry path: cold keys present -> cache kept, ONE (warm) run only
    monkeypatch.setattr(bench, "_HAVE_KEYS", frozenset(
        {"e2e_detect_20k_seconds", "e2e_detect_20k_test_auroc"}))
    out = {}
    bench._leg_e2e(out)
    assert len(calls) == 1  # warm only
    assert sentinel.exists()  # the first attempt's cache survived
    assert "e2e_detect_20k_seconds" not in out
    assert out["e2e_detect_20k_warm_phase_seconds"] == 0.7
    assert out["e2e_detect_20k_test_auroc_warm"] == 0.96

    # fresh path: no keys -> cache reset before cold, cold + warm run
    calls.clear()
    monkeypatch.setattr(bench, "_HAVE_KEYS", frozenset())
    out = {}
    bench._leg_e2e(out)
    assert len(calls) == 2  # cold then warm
    assert not sentinel.exists()  # stale cache deleted for honest cold
    assert out["e2e_detect_20k_seconds"] >= 0
    assert out["e2e_detect_20k_test_auroc"] == 0.96
