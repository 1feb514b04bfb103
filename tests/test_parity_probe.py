"""cli/parity_check.py asset probing (VERDICT round-4 item 7).

The probe must turn asset presence at well-known paths into the SURVEY
§6 runnable-config list with no code edits: env-var root first, the
registry's checkpoint resolution order, and CIFAR-N gating the 'real'
noise configs."""

import json
import sys

import pytest

from lemon_tpu.cli.parity_check import main as parity_main, probe_assets


def _touch(path, content=b"x"):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(content)


@pytest.fixture
def empty_env(monkeypatch, tmp_path):
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(tmp_path / "nonexistent"))
    monkeypatch.delenv("LEMON_TPU_CKPT_HUGGINGFACE_CLIP", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "no_hf"))
    monkeypatch.delenv("HF_HUB_CACHE", raising=False)
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_probe_empty(empty_env):
    probe = probe_assets()
    assert probe["runnable"] == []
    assert probe["checkpoint"] is None
    assert all(v is None for v in probe["assets"].values())


def test_probe_finds_root_and_gates_configs(empty_env, monkeypatch):
    root = empty_env / "d"
    for i in range(1, 6):
        _touch(root / "cifar-10-batches-py" / f"data_batch_{i}")
    _touch(root / "cifar-10-batches-py" / "test_batch")
    _touch(root / "CIFAR-10_human.pt")
    _touch(root / "checkpoints" / "huggingface_clip.npz")
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(root))

    probe = probe_assets()
    assert probe["data_root"] == str(root)
    assert probe["checkpoint"].endswith("huggingface_clip.npz")
    got = {(c["dataset"], c["noise_type"]) for c in probe["runnable"]}
    # cifar10 symmetric/asymmetric from pickles+ckpt; 'real' from CIFAR-N;
    # no cifar100 configs without cifar-100-python.
    assert got == {("cifar10", "symmetric"), ("cifar10", "asymmetric"), ("cifar10", "real")}


def test_probe_tarball_counts_as_present(empty_env, monkeypatch):
    root = empty_env / "d2"
    _touch(root / "cifar-10-python.tar.gz")
    _touch(root / "checkpoints" / "huggingface_clip.pt")
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(root))
    probe = probe_assets()
    assert probe["assets"]["cifar10"] == str(root)
    assert {c["dataset"] for c in probe["runnable"]} == {"cifar10"}


def test_probe_hub_cache_checkpoint(empty_env, monkeypatch):
    hub = empty_env / "hf" / "hub"
    snap = hub / "models--openai--clip-vit-base-patch32" / "snapshots" / "abc123"
    _touch(snap / "model.safetensors")
    monkeypatch.setenv("HF_HOME", str(empty_env / "hf"))
    probe = probe_assets()
    assert probe["checkpoint"] == str(snap / "model.safetensors")


def test_no_checkpoint_means_nothing_runnable(empty_env, monkeypatch):
    root = empty_env / "d3"
    for i in range(1, 6):
        _touch(root / "cifar-10-batches-py" / f"data_batch_{i}")
    _touch(root / "cifar-10-batches-py" / "test_batch")
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(root))
    probe = probe_assets()
    assert probe["assets"]["cifar10"] == str(root)
    assert probe["runnable"] == []  # refusing random-weight AUROCs


def test_auto_mode_exits_zero_without_assets(empty_env, capsys):
    parity_main(["--auto", "--output_dir", str(empty_env / "out")])
    out = capsys.readouterr().out
    assert "no runnable configuration" in out


def test_single_mode_requires_checkpoint(empty_env):
    with pytest.raises(SystemExit) as e:
        parity_main(["--output_dir", str(empty_env / "out")])
    assert "checkpoint" in str(e.value)


def test_checkpoint_found_at_discovered_candidate_root(empty_env, monkeypatch):
    """Round-5 review finding: datasets + checkpoint both under a
    CANDIDATE root (no env vars at all) must yield a runnable config —
    the checkpoint search has to cover the discovered data root, not just
    $LEMON_TPU_DATA_ROOT-or-./data."""
    import lemon_tpu.cli.parity_check as pc

    root = empty_env / "well_known"
    for i in range(1, 6):
        _touch(root / "cifar-10-batches-py" / f"data_batch_{i}")
    _touch(root / "cifar-10-batches-py" / "test_batch")
    _touch(root / "checkpoints" / "huggingface_clip.npz")
    monkeypatch.delenv("LEMON_TPU_DATA_ROOT", raising=False)
    monkeypatch.setattr(pc, "_CANDIDATE_ROOTS", (str(root),))

    probe = probe_assets()
    assert probe["data_root"] == str(root)
    assert probe["checkpoint"] == str(root / "checkpoints" / "huggingface_clip.npz")
    assert {c["dataset"] for c in probe["runnable"]} == {"cifar10"}


def test_env_checkpoint_pointing_nowhere_is_a_hard_error(empty_env, monkeypatch):
    """An explicitly-set LEMON_TPU_CKPT_HUGGINGFACE_CLIP with a typo'd
    path must fail loudly, not silently substitute another checkpoint
    (the parity AUROC would be reported against weights the user did not
    select)."""
    hub = empty_env / "hf" / "hub"
    snap = hub / "models--openai--clip-vit-base-patch32" / "snapshots" / "abc123"
    _touch(snap / "model.safetensors")  # a tempting substitute exists
    monkeypatch.setenv("HF_HOME", str(empty_env / "hf"))
    monkeypatch.setenv("LEMON_TPU_CKPT_HUGGINGFACE_CLIP", str(empty_env / "typo.npz"))
    with pytest.raises(SystemExit) as e:
        probe_assets()
    assert "LEMON_TPU_CKPT_HUGGINGFACE_CLIP" in str(e.value)


def test_auto_isolates_per_config_failures(empty_env, monkeypatch, capsys):
    """One failing configuration must not discard the completed reports:
    parity_auto.json is always written, carries the error entry, and the
    sweep exits nonzero only at the END."""
    import argparse
    import json as _json

    import lemon_tpu.cli.parity_check as pc

    calls = []

    def fake_main(argv):
        ns = dict(zip(argv[::2], argv[1::2]))
        out = ns["--output_dir"]
        calls.append(ns["--noise_type"])
        if ns["--noise_type"] == "asymmetric":
            raise RuntimeError("boom")
        from pathlib import Path

        Path(out).mkdir(parents=True, exist_ok=True)
        (Path(out) / "parity.json").write_text(_json.dumps({"test_AUROC": 0.9}))

    monkeypatch.setattr(pc, "main", fake_main)
    monkeypatch.setattr(pc, "probe_assets", lambda: {
        "data_root": None, "checkpoint": None, "assets": {}, "manifest": {},
        "runnable": [{"dataset": "cifar10", "noise_type": "symmetric"},
                      {"dataset": "cifar10", "noise_type": "asymmetric"},
                      {"dataset": "cifar10", "noise_type": "real"}],
    })
    args = argparse.Namespace(output_dir=str(empty_env / "auto_out"), noise_level=0.4,
                              knn_k=5, seed=0, data_seed=0, platform=None)
    with pytest.raises(SystemExit) as e:
        pc._auto(args)
    assert "1 of 3" in str(e.value)
    assert calls == ["symmetric", "asymmetric", "real"]  # sweep continued past the failure
    reports = _json.loads((empty_env / "auto_out" / "parity_auto.json").read_text())
    assert len(reports) == 3
    assert reports[0]["test_AUROC"] == 0.9 and reports[2]["test_AUROC"] == 0.9
    assert "error" in reports[1] and "boom" in reports[1]["error"]
