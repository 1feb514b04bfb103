"""Device preprocessing parity vs PIL (SURVEY.md §7 hard part #1 / build
step 2: 'the #1 parity risk — validate pixel-level against PIL')."""

import numpy as np
import pytest

from lemon_tpu.ops.image import (
    CLIP_MEAN,
    CLIP_STD,
    center_crop_bounds,
    preprocess_device,
    preprocess_pil,
    resize_matrix,
    resize_shorter_side,
)

PIL = pytest.importorskip("PIL")
from PIL import Image


def test_resize_matrix_rows_sum_to_one():
    for pair in [(32, 224), (224, 224), (640, 224), (100, 37)]:
        m = resize_matrix(*pair)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_shorter_side_and_crop_conventions():
    assert resize_shorter_side(32, 32, 224) == (224, 224)
    # torchvision truncates the long edge (int(224*640/480)=298), it does
    # not round to 299 — _compute_resized_output_size
    assert resize_shorter_side(480, 640, 224) == (224, 298)
    assert resize_shorter_side(640, 480, 224) == (298, 224)
    assert center_crop_bounds(298, 224, 224) == (37, 0)


@pytest.mark.parametrize("h,w", [(32, 32), (224, 224), (480, 640), (96, 128)])
def test_device_matches_pil(h, w):
    """Max abs diff vs PIL stays within PIL's uint8 fixed-point rounding."""
    rng = np.random.default_rng(0)
    # Smooth-ish image: uint8 quantization noise dominates on white noise,
    # so build a low-frequency field like a real photo.
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            128 + 100 * np.sin(2 * np.pi * xx / w * (c + 1)) * np.cos(2 * np.pi * yy / h * (c + 2))
            for c in range(3)
        ],
        axis=-1,
    )
    img = np.clip(base + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(np.uint8)

    ref = preprocess_pil(Image.fromarray(img))
    ours = np.asarray(preprocess_device(img[None]))[0]
    assert ours.shape == ref.shape == (224, 224, 3)
    # In normalized units one uint8 step is ~(1/255)/std ~= 0.0146; PIL's
    # fixed-point coefficients leave at most one step on <0.1% of pixels.
    diff = np.abs(ours - ref)
    assert diff.max() < 0.022, diff.max()
    assert (diff > 1e-6).mean() < 1e-3


def test_batch_preprocess_shape_and_stats():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
    out = np.asarray(preprocess_device(imgs))
    assert out.shape == (4, 224, 224, 3)
    # Normalization: mid-gray input lands near (0.5 - mean)/std.
    gray = np.full((1, 32, 32, 3), 128, np.uint8)
    out = np.asarray(preprocess_device(gray))[0]
    expected = (128 / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out.mean(axis=(0, 1)), expected, atol=1e-3)
