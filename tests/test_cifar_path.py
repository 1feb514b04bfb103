"""CIFAR dataset code path driven with synthetic on-disk pickle fixtures
(the standard CIFAR python-pickle layout), so the real-data loaders, splits
and noise wiring are exercised without downloads."""

import pickle

import numpy as np
import pytest

from lemon_tpu.data.datasets import get_dataset
from lemon_tpu.detect import DetectionConfig, run_detection


@pytest.fixture()
def cifar_root(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir(parents=True)
    n_per = 60
    for i in range(1, 6):
        data = rng.integers(0, 256, (n_per, 3072), np.uint8)
        labels = rng.integers(0, 10, n_per).tolist()
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    with open(base / "test_batch", "wb") as f:
        pickle.dump(
            {b"data": rng.integers(0, 256, (n_per, 3072), np.uint8), b"labels": rng.integers(0, 10, n_per).tolist()},
            f,
        )
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(tmp_path))
    return tmp_path


def test_cifar10_loading_and_noise(cifar_root):
    train, val, test = get_dataset("cifar10", data_seed=0, noise_level=0.4, noise_type="symmetric")
    assert len(train) + len(val) + len(test) == 300
    assert len(train) == 240 and len(val) == 30
    assert train.images.shape == (240, 32, 32, 3) and train.images.dtype == np.uint8
    assert 0.25 < train.is_mislabel.mean() < 0.55
    # data_seed determinism
    train2, _, _ = get_dataset("cifar10", data_seed=0, noise_level=0.4, noise_type="symmetric")
    np.testing.assert_array_equal(train.y_noisy, train2.y_noisy)


def test_cifar10_full_variant(cifar_root):
    train, val, test = get_dataset("cifar10_full", data_seed=0, noise_level=0.4, noise_type="asymmetric")
    assert len(train) == 240 and len(val) == 60 and len(test) == 60  # 80/20 + full test set


def test_run_lemon_on_cifar10(cifar_root):
    """The reference's acceptance config 1 shape (cifar10 + noise 0.4)
    running end-to-end on the CIFAR code path (tiny encoder stands in for
    the ViT-B/32 checkpoint)."""
    cfg = DetectionConfig(
        dataset="cifar10", noise_type="symmetric", noise_level=0.4, clip_model="tiny",
        knn_k=3, batch_size=64, knn_tile=64,
        grid={"beta": [0, 5], "gamma": [0, 5], "tau_1": [0], "tau_2": [0]},
        skip_train=True,
    )
    # encoder registry maps non-synthetic datasets to the named model; patch
    # through the 'tiny' name directly
    res = run_detection(cfg)
    agg = res["agg_results"]["know_val_labels"]
    assert "AUROC" in agg["test"]
    df = res["df"]
    # prompts rendered from the CIFAR label vocabulary
    assert set(df.sset.unique()) == {"val", "test"}
