"""Data layer tests: noise-injection RNG parity, splits, dataset registry."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from lemon_tpu.data.datasets import (
    CaptioningSplit,
    ClassificationSplit,
    get_dataset,
    iter_batches,
    load_images,
    synthetic_captioning,
    synthetic_classification,
)
from lemon_tpu.data.labels import LABEL_SETS, num_classes
from lemon_tpu.data.noise import (
    apply_caption_noise,
    apply_transition_noise,
    caption_noise_by_matching,
    caption_noise_random,
    flip_labels,
    pairflip_matrix,
    symmetric_matrix,
)
from lemon_tpu.data.splits import split_80_10_10, stratified_50_25_25

REFERENCE_NOISE = "/root/reference/lib/datasets/noise_captioning.py"


def test_label_sets():
    assert num_classes("cifar10") == 10
    assert num_classes("cifar100") == 100
    assert num_classes("mini_imagenet") == 100
    assert num_classes("stanford_cars") == 196
    assert LABEL_SETS["cifar10"][3] == "cat"
    assert LABEL_SETS["cifar100"][0] == "apple"


def test_transition_matrices():
    s = symmetric_matrix(10, 0.4)
    np.testing.assert_allclose(s.sum(axis=1), 1.0)
    assert s[0, 0] == pytest.approx(0.6)
    assert s[0, 1] == pytest.approx(0.4 / 9)

    p = pairflip_matrix(10, 0.4)
    np.testing.assert_allclose(p.sum(axis=1), 1.0)
    assert p[0, 0] == pytest.approx(0.6) and p[0, 1] == pytest.approx(0.4)
    assert p[9, 0] == pytest.approx(0.4)  # wraps around


def test_transition_noise_rng_parity():
    """Draw-for-draw parity with the reference's RandomState loop
    (lib/datasets/utils.py:197-219), transcribed independently here."""
    y = np.random.default_rng(0).integers(0, 10, 500)
    t = symmetric_matrix(10, 0.4)
    ours = apply_transition_noise(y, t, seed=7)

    stream = np.random.RandomState(7)
    expected = y.copy()
    for i in range(len(y)):
        draw = stream.multinomial(1, t[y[i], :], 1)[0]
        expected[i] = np.where(draw == 1)[0][0]
    np.testing.assert_array_equal(ours, expected)
    # sanity: roughly the requested noise level
    assert abs((ours != y).mean() - 0.4) < 0.08


def test_flip_labels_noise_levels():
    y = np.random.default_rng(1).integers(0, 100, 2000)
    for noise_type in ("symmetric", "asymmetric"):
        noisy = flip_labels("cifar100", noise_type, 0.4, y, data_seed=0)
        assert abs((noisy != y).mean() - 0.4) < 0.05
    # determinism in data_seed
    a = flip_labels("cifar100", "symmetric", 0.4, y, data_seed=3)
    b = flip_labels("cifar100", "symmetric", 0.4, y, data_seed=3)
    c = flip_labels("cifar100", "symmetric", 0.4, y, data_seed=4)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_caption_noise_random():
    swaps = caption_noise_random(100, 0.3, seed=42)
    assert len(swaps) == 30
    for src, dst in swaps.items():
        assert src != dst


def test_caption_noise_matching_shares_tag():
    rng = np.random.default_rng(2)
    tags = [list(rng.choice(20, rng.integers(0, 4), replace=False)) for _ in range(200)]
    swaps = caption_noise_by_matching(tags, 0.3, seed=42)
    for src, dst in swaps.items():
        assert set(tags[src]) & set(tags[dst]), (src, dst)


@pytest.mark.skipif(not os.path.exists(REFERENCE_NOISE), reason="reference tree not mounted")
def test_caption_noise_parity_with_reference():
    """The caption-noise RNG streams must match the reference exactly —
    noise_captioning.py is numpy-only so it can serve as a live oracle."""
    spec = importlib.util.spec_from_file_location("ref_noise", REFERENCE_NOISE)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    assert caption_noise_random(97, 0.35, seed=5) == ref.random_noise_dict(97, 0.35, seed=5)

    rng = np.random.default_rng(3)
    tags = [list(map(int, rng.choice(15, rng.integers(0, 4), replace=False))) for _ in range(150)]
    ours = caption_noise_by_matching(tags, 0.4, seed=11)
    theirs = ref.calc_noise_by_integer_matching(np.array(tags, object), 0.4, seed=11)
    assert ours == theirs

    import pandas as pd

    df = pd.DataFrame({"sentence": [f"caption {i}" for i in range(150)]}, index=np.arange(150) + 1000)
    ours_df = apply_caption_noise(df, ours)
    theirs_df = ref.noise_given_dict(df, theirs)
    pd.testing.assert_series_equal(ours_df["sentence"], theirs_df["sentence"])
    pd.testing.assert_series_equal(ours_df["is_mislabel"], theirs_df["is_mislabel"])


def test_splits_deterministic_and_disjoint():
    tr, va, te = split_80_10_10(1000, data_seed=0)
    assert len(tr) == 800 and len(va) == 100 and len(te) == 100
    assert len(set(tr) | set(va) | set(te)) == 1000
    tr2, _, _ = split_80_10_10(1000, data_seed=0)
    np.testing.assert_array_equal(tr, tr2)

    strata = (np.arange(1000) < 700).astype(int)
    tr, va, te = stratified_50_25_25(strata, seed=0)
    assert abs(strata[tr].mean() - 0.7) < 0.02


def test_synthetic_classification_dataset():
    train, val, test = get_dataset("synthetic", data_seed=0, noise_level=0.4, noise_type="symmetric", synthetic_n=300)
    assert len(train) == 240 and len(val) == 30 and len(test) == 30
    assert train.images.dtype == np.uint8 and train.images.shape[1:] == (32, 32, 3)
    assert 0.25 < train.is_mislabel.mean() < 0.55


def test_synthetic_captioning_dataset():
    train, val, test = synthetic_captioning(200, data_seed=0, noise_level=0.3)
    assert train.sentence.shape == train.gold_sentence.shape
    assert 0.15 < train.is_mislabel.mean() <= 0.35
    # flipped rows actually have different captions
    flipped = train.is_mislabel.astype(bool)
    assert (train.sentence[flipped] != train.gold_sentence[flipped]).all()


def test_iter_batches_padding():
    split = ClassificationSplit(
        y_clean=np.arange(10), y_noisy=np.arange(10), images=np.zeros((10, 4, 4, 3), np.uint8)
    )
    batches = list(iter_batches(split, 4))
    assert [n for _, n in batches] == [4, 4, 2]
    assert all(len(idx) == 4 for idx, _ in batches)  # static shapes
    imgs = load_images(split, batches[-1][0])
    assert imgs.shape == (4, 4, 4, 3)


def test_load_images_heterogeneous_paths(tmp_path):
    """Real caption corpora have ragged raw sizes: load_images must
    host-unify them with the reference-exact PIL Resize+CenterCrop when
    decode_size is given, and fail loudly (not with a numpy stack error)
    when it is not."""
    from PIL import Image

    from lemon_tpu.ops.image import pil_resize_crop_u8, preprocess_pil

    rng = np.random.default_rng(0)
    arrs = [
        rng.integers(0, 256, (40, 64, 3), np.uint8),
        rng.integers(0, 256, (56, 48, 3), np.uint8),
        rng.integers(0, 256, (32, 32, 3), np.uint8),
    ]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(a).save(p)
        paths.append(str(p))
    split = CaptioningSplit(
        sentence=np.array(["a", "b", "c"], object),
        gold_sentence=np.array(["a", "b", "c"], object),
        images=None, paths=np.array(paths, object),
    )
    with pytest.raises(ValueError, match="decode_size"):
        load_images(split, np.arange(3))
    out = load_images(split, np.arange(3), decode_size=32)
    assert out.shape == (3, 32, 32, 3) and out.dtype == np.uint8
    # reference-exact pixels: (u8/255 - mean)/std equals the PIL oracle
    for a, got in zip(arrs, out):
        np.testing.assert_array_equal(got, pil_resize_crop_u8(a, 32))
        oracle = preprocess_pil(Image.fromarray(a), size=32)
        np.testing.assert_allclose(
            (got / 255.0 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array([0.26862954, 0.26130258, 0.27577711]),
            oracle, atol=1e-6,
        )


def test_cifar_n_real_noise_loader(tmp_path, monkeypatch):
    """'real' noise loads CIFAR-N human labels from the standard .pt files
    (lib/datasets/utils.py:172-178), gated on file presence."""
    torch = pytest.importorskip("torch")
    labels = np.random.default_rng(0).integers(0, 10, 100)
    torch.save({"worse_label": labels}, tmp_path / "CIFAR-10_human.pt")
    from lemon_tpu.data.noise import load_cifar_n_labels

    out = load_cifar_n_labels("cifar10", data_root=str(tmp_path))
    np.testing.assert_array_equal(out, labels)
    out2 = flip_labels("cifar10", "real", 0.0, None, data_root=str(tmp_path))
    np.testing.assert_array_equal(out2, labels)
    with pytest.raises(FileNotFoundError):
        load_cifar_n_labels("cifar100", data_root=str(tmp_path))
