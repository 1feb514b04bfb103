"""Supervised image classifier for downstream filter-then-train and the
training-dynamics baselines.

Counterpart of SuperviseClassifier (lib/models/downstream_models.py:45-108):
a vision backbone with a linear head, cross-entropy (or BCE for binary)
loss, optional frozen backbone via stop_gradient. The backbone follows the
config TYPE, mirroring get_img_base (lib/models/utils.py:49-61):

- :class:`~lemon_tpu.models.clip.ClipConfig` → our Flax CLIP ViT tower
  (the 'openai/clip-vit-base-patch32' branch, TPU-first default),
- :class:`TvResNetSpec` → torchvision-layout ResNet-50 with the 768-d fc
  (the reference's only runnable training_dependent configuration),
- :class:`~lemon_tpu.models.torch_backbones.GoogleViTConfig` → HF ViTModel
  CLS encoder ('vit-base-patch16-224').

ResNet carries real BatchNorm state: train steps must apply with
``mutable=["batch_stats"]`` (see :func:`apply_classifier_train`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from lemon_tpu.models.clip import ClipConfig, VisionTower


@dataclasses.dataclass(frozen=True)
class TvResNetSpec:
    """torchvision resnet50 backbone spec (get_img_base 'resnet50',
    lib/models/utils.py:50-53: fc replaced with Linear(2048, embed_dim))."""

    embed_dim: int = 768
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    image_resolution: int = 224

    @staticmethod
    def tiny() -> "TvResNetSpec":
        return TvResNetSpec(embed_dim=32, stage_sizes=(1, 1, 1, 1), width=8, image_resolution=64)


class ImageClassifier(nn.Module):
    cfg: Any  # ClipConfig | TvResNetSpec | GoogleViTConfig
    num_classes: int
    freeze_backbone: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels, train: bool = False):
        from lemon_tpu.models.torch_backbones import GoogleViTConfig, GoogleViTEncoder, TvResNet50

        if isinstance(self.cfg, TvResNetSpec):
            feats = TvResNet50(
                embed_dim=self.cfg.embed_dim, stage_sizes=tuple(self.cfg.stage_sizes),
                width=self.cfg.width, dtype=self.compute_dtype, name="backbone",
            )(pixels, train=train)
        elif isinstance(self.cfg, GoogleViTConfig):
            feats = GoogleViTEncoder(self.cfg, dtype=self.compute_dtype, name="backbone")(pixels, train=train)
        else:
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


def init_classifier(cfg: Any, num_classes: int, seed: int = 0, freeze_backbone: bool = False,
                    backbone_params: Optional[dict] = None):
    """Build + init; optionally warm-start the backbone from converted
    pretrained weights (the 'use_pretrained' path of get_img_base).
    Returns (model, variables) where ``variables`` carries ``batch_stats``
    iff the backbone has BatchNorm (resnet50)."""
    model = ImageClassifier(cfg, num_classes, freeze_backbone=freeze_backbone)
    res = getattr(cfg, "image_resolution", None) or cfg.image_size
    pixels = jnp.zeros((1, res, res, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), pixels)
    if backbone_params is not None:
        merged = dict(variables)
        if "params" in backbone_params:  # converter output: {'params', 'batch_stats'?}
            merged["params"] = {**variables["params"], "backbone": backbone_params["params"]}
            if "batch_stats" in backbone_params:
                merged["batch_stats"] = {"backbone": backbone_params["batch_stats"]}
        else:  # raw param tree (CLIP warm start)
            merged["params"] = {**variables["params"], "backbone": backbone_params}
        variables = merged
    return model, variables


def apply_classifier_train(model: ImageClassifier, variables, pixels) -> Tuple[jnp.ndarray, dict]:
    """Train-mode forward returning (logits, updated variables): BatchNorm
    backbones update batch_stats (torchvision train() semantics); stateless
    backbones pass variables through unchanged."""
    if "batch_stats" in variables:
        logits, upd = model.apply(variables, pixels, train=True, mutable=["batch_stats"])
        return logits, {**variables, **upd}
    return model.apply(variables, pixels, train=True), variables
