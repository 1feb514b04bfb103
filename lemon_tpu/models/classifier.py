"""Supervised image classifier for downstream filter-then-train and the
training-dynamics baselines.

Counterpart of SuperviseClassifier (lib/models/downstream_models.py:45-108):
a vision backbone (our Flax CLIP ViT tower — TPU-first; the reference also
offers torchvision resnet50 / HF ViT, lib/models/utils.py:49-61) with a
linear head, cross-entropy (or BCE for binary) loss, optional frozen
backbone via stop_gradient.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from lemon_tpu.models.clip import ClipConfig, VisionTower


class ImageClassifier(nn.Module):
    cfg: ClipConfig
    num_classes: int
    freeze_backbone: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        feats = VisionTower(self.cfg, compute_dtype=self.compute_dtype, name="backbone")(pixels)
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        return nn.Dense(self.num_classes, dtype=self.compute_dtype, name="head")(feats)


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CE for multiclass; BCE-with-logits when the head has one output
    (downstream_models.py:96-104). ``mask``: per-row 0/1 validity — the
    static-shape batch iterator pads short final batches, and padded rows
    must not contribute to the mean (the reference's DataLoader simply
    yields a short batch, seeing each sample exactly once per epoch)."""
    if logits.shape[-1] == 1:
        per = optax.sigmoid_binary_cross_entropy(logits[:, 0], labels.astype(logits.dtype))
    else:
        per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if mask is None:
        return per.mean()
    mask = mask.astype(per.dtype)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def init_classifier(cfg: ClipConfig, num_classes: int, seed: int = 0, freeze_backbone: bool = False,
                    backbone_params: Optional[dict] = None):
    """Build + init; optionally warm-start the backbone from CLIP vision
    params (the 'pretrained' path of get_img_base)."""
    model = ImageClassifier(cfg, num_classes, freeze_backbone=freeze_backbone)
    pixels = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), pixels)
    if backbone_params is not None:
        params = {"params": {**params["params"], "backbone": backbone_params}}
    return model, params
