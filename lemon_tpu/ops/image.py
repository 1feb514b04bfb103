"""TPU-resident image preprocessing.

Replaces the reference's torchvision-on-CPU-workers pipeline
(lib/datasets/utils.py:163-170: bicubic Resize(224) -> CenterCrop(224) ->
ToTensor -> Normalize(CLIP mean/std)) with a device computation:

- Separable resize expressed as two matmuls — ``A_h @ img @ A_w^T`` per
  channel — which rides the MXU instead of a gather-heavy interpolation.
  The weight matrices replicate PIL's convolution exactly (triangle/cubic
  kernel, half-pixel centers, per-row normalization, antialias support
  widening on downscale), so float outputs match PIL to within its uint8
  fixed-point rounding (parity-tested in tests/test_image.py).
- Crop + scale + normalize fuse into the same jitted program.

The host keeps only JPEG/PNG decode; a PIL fallback path
(:func:`preprocess_pil`) provides bit-level reference behavior for parity
audits.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CLIP normalization constants (lib/datasets/utils.py:159-160).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
IN_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IN_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL's bicubic kernel (Keys, a = -0.5)."""
    ax = np.abs(x)
    w = np.where(
        ax < 1,
        ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        np.where(ax < 2, a * (((ax - 5) * ax + 8) * ax - 4), 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic bicubic interpolation matrix with
    PIL semantics: half-pixel centers, kernel stretched by the scale factor
    when downscaling (antialias), weights renormalized per row, edge clamp.
    """
    scale = in_size / out_size
    filter_scale = max(scale, 1.0)
    support = 2.0 * filter_scale
    mat = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        # PIL clips the tap window to the image bounds *before* normalizing
        # (out-of-range taps are dropped, not clamped to the edge pixel).
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        js = np.arange(lo, hi)
        w = _cubic_kernel((js + 0.5 - center) / filter_scale)
        mat[i, js] = w / w.sum()
    return mat.astype(np.float32)


def center_crop_bounds(h: int, w: int, size: int) -> Tuple[int, int]:
    """torchvision CenterCrop offset convention: round half down."""
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return top, left


def resize_shorter_side(h: int, w: int, target: int) -> Tuple[int, int]:
    """torchvision Resize(int) convention: shorter side -> target, preserve
    aspect ratio. The long edge TRUNCATES (``int(target * long / short)``,
    torchvision _compute_resized_output_size) — rounding instead shifts
    the resample grid by a pixel for ~half of all aspect ratios and
    changes every output pixel vs the reference pipeline."""
    if h <= w:
        return target, max(int(target * w / h), 1)
    return max(int(target * h / w), 1), target


def _round_u8(x):
    """PIL's fixed-point rounding between resample passes: round half up,
    clip to [0, 255]."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


_RESIZE_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "crop", "mean_std", "pil_rounding", "precision")
)
def _resize_crop_normalize(img_u8, a_h, a_w, *, out_h, out_w, crop, mean_std, pil_rounding, precision="highest"):
    """img_u8: (B, H, W, 3) uint8 -> (B, crop, crop, 3) float32 normalized."""
    mp = _RESIZE_PRECISION[precision]
    x = img_u8.astype(jnp.float32)
    # Separable resize as two MXU matmuls per channel. PIL resamples
    # horizontally first, storing a uint8 intermediate — emulating that
    # rounding keeps us within one quantization step of the reference.
    x = jnp.einsum("ow,bhwc->bhoc", a_w, x, precision=mp)
    if pil_rounding:
        x = _round_u8(x)
    x = jnp.einsum("oh,bhwc->bowc", a_h, x, precision=mp)
    if pil_rounding:
        x = _round_u8(x)
    top, left = center_crop_bounds(out_h, out_w, crop)
    x = jax.lax.dynamic_slice(
        x, (0, max(top, 0), max(left, 0), 0), (x.shape[0], crop, crop, 3)
    )
    mean, std = mean_std
    x = (x / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)
    return x


def preprocess_device(
    images_u8: np.ndarray,
    size: int = 224,
    mean=tuple(CLIP_MEAN),
    std=tuple(CLIP_STD),
    pil_rounding: bool = True,
    precision: str = "highest",
) -> jnp.ndarray:
    """CLIP preprocessing on device for a batch of same-shape uint8 images
    (B, H, W, 3). Returns (B, size, size, 3) float32 NHWC.

    ``pil_rounding=False`` skips the uint8 intermediate emulation for a
    slightly more accurate (and marginally faster) pure-float path.
    ``precision``: matmul precision of the two resize passes. 'highest'
    (fp32, 6 MXU passes) is the PIL-parity default; 'default' (bf16) is
    the bf16 fast-path choice — measured +4.4% end-to-end embed
    throughput on v5e, pixel error ~1e-3 of range (below the tower's own
    bf16 activation rounding). 'high' (bf16x3) still flips ~0.1% of the
    uint8 roundings vs HIGHEST, so exact PIL parity requires 'highest'.
    """
    b, h, w, _ = images_u8.shape
    out_h, out_w = resize_shorter_side(h, w, size)
    a_h = jnp.asarray(resize_matrix(h, out_h))
    a_w = jnp.asarray(resize_matrix(w, out_w))
    return _resize_crop_normalize(
        jnp.asarray(images_u8),
        a_h,
        a_w,
        out_h=out_h,
        out_w=out_w,
        crop=size,
        mean_std=(tuple(mean), tuple(std)),
        pil_rounding=pil_rounding,
        precision=precision,
    )


def pil_resize_crop_u8(arr: np.ndarray, size: int) -> np.ndarray:
    """torchvision ``Resize(size, bicubic) + CenterCrop(size)`` on a uint8
    HWC array via PIL — byte-exact with the reference's transform
    (lib/datasets/utils.py:163-170). Used to unify heterogeneous raw image
    sizes on host before a device batch is assembled."""
    from PIL import Image

    im = Image.fromarray(np.asarray(arr, np.uint8))
    h, w = arr.shape[:2]
    out_h, out_w = resize_shorter_side(h, w, size)
    im = im.resize((out_w, out_h), Image.BICUBIC)
    top, left = center_crop_bounds(out_h, out_w, size)
    im = im.crop((left, top, left + size, top + size))
    return np.asarray(im, np.uint8)


def preprocess_pil(pil_image, size: int = 224, mean=CLIP_MEAN, std=CLIP_STD) -> np.ndarray:
    """Host-side reference path, byte-matching torchvision's
    Resize(bicubic)+CenterCrop+ToTensor+Normalize. Returns (size, size, 3)."""
    from PIL import Image

    w, h = pil_image.size
    out_h, out_w = resize_shorter_side(h, w, size)
    img = pil_image.convert("RGB").resize((out_w, out_h), Image.BICUBIC)
    top, left = center_crop_bounds(out_h, out_w, size)
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - mean) / std
