"""Downstream classification: filter-then-train, checkpoint artifact, and
the CIFAR-10-C robustness-eval mode (train_downstream_classification.py
:112-114,193-198,221-233,355-358 — the reference's cifar10c branch is
defective there; SURVEY §7 item 7 says rebuild the intent)."""

import pickle

import numpy as np
import pytest

from lemon_tpu.data.datasets import get_dataset, load_cifar10c
from lemon_tpu.models.clip import ClipConfig
from lemon_tpu.train.downstream import (
    DownstreamConfig,
    evaluate_cifar10c,
    filter_split,
    train_downstream,
)


@pytest.fixture()
def cifar10c_root(tmp_path, monkeypatch):
    """Tiny CIFAR-10-C-layout fixture: {corruption}.npy stacks 5 severities
    of a 20-image 'test set', labels.npy shared."""
    rng = np.random.default_rng(0)
    base = tmp_path / "CIFAR-10-C"
    base.mkdir(parents=True)
    labels = np.tile(rng.integers(0, 10, 20), 5)
    images = rng.integers(0, 256, (100, 32, 32, 3), np.uint8)
    np.save(base / "gaussian_noise.npy", images)
    np.save(base / "labels.npy", labels)
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(tmp_path))
    return tmp_path, images, labels


def test_load_cifar10c_and_severity(cifar10c_root):
    _, images, labels = cifar10c_root
    split = load_cifar10c("gaussian_noise")
    assert len(split) == 100
    np.testing.assert_array_equal(split.y_clean, labels)
    np.testing.assert_array_equal(split.y_clean, split.y_noisy)  # eval-only: clean
    sev3 = load_cifar10c("gaussian_noise", severity=3)
    assert len(sev3) == 20
    np.testing.assert_array_equal(sev3.images, images[40:60])


def test_get_dataset_cifar10c_requires_corruption(cifar10c_root):
    with pytest.raises(AssertionError):
        get_dataset("cifar10c", data_seed=0)


def _tiny_cfg(**kw):
    return DownstreamConfig(
        num_classes=10, epochs=2, batch_size=32, es_patience=2,
        model_cfg=ClipConfig.tiny(), **kw,
    )


def test_train_downstream_writes_checkpoint_and_robustness_eval(tmp_path, cifar10c_root):
    splits = dict(zip(("train", "val", "test"),
                      get_dataset("synthetic", 0, noise_level=0.2, synthetic_n=200)))
    out = tmp_path / "train"
    results = train_downstream(_tiny_cfg(), splits, out_dir=out)
    assert (out / "done").exists()
    ckpt = out / "ckpt.msgpack"
    assert ckpt.exists() and ckpt.stat().st_size > 0
    assert 0.0 <= results["test"]["accuracy"] <= 1.0

    # robustness mode: two "models" (same ckpt twice, the reference loops 3)
    rob_out = tmp_path / "rob"
    rob = evaluate_cifar10c(_tiny_cfg(), [ckpt, ckpt], "gaussian_noise", rob_out)
    for mc in (0, 1):
        pred = np.load(rob_out / f"test_pred_y_gaussian_noise_{mc}.npy")
        true = np.load(rob_out / f"test_true_y_gaussian_noise_{mc}.npy")
        assert pred.shape == true.shape == (100,)
        with open(rob_out / f"results_gaussian_noise_{mc}.pkl", "rb") as f:
            saved = pickle.load(f)
        assert saved["average_accuracy"] == rob[mc]["average_accuracy"]
        assert set(saved) == {"average_accuracy", "worst_accuracy", "group_metrics"}
    # identical checkpoints -> identical predictions
    np.testing.assert_array_equal(
        np.load(rob_out / "test_pred_y_gaussian_noise_0.npy"),
        np.load(rob_out / "test_pred_y_gaussian_noise_1.npy"),
    )
    assert (rob_out / "done").exists()


def test_filter_split_drops_high_scores():
    splits = dict(zip(("train", "val", "test"),
                      get_dataset("synthetic", 0, noise_level=0.4, synthetic_n=120)))
    train = splits["train"]
    rng = np.random.default_rng(1)
    # oracle-ish scores: clean in [0, 0.1), flips at 1.0+
    scores = train.is_mislabel + rng.uniform(0, 0.1, len(train))
    clean_frac = 1.0 - train.is_mislabel.mean()
    kept = filter_split(train, scores, percentile=100 * clean_frac - 5)
    assert len(kept) > 0
    assert kept.is_mislabel.mean() == 0.0  # threshold sits inside the clean band
