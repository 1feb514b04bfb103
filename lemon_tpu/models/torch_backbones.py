"""Alternate classifier backbones matching the reference's get_img_base
(lib/models/utils.py:49-61): a torchvision-layout ResNet-50 whose final fc
maps to a 768-d embedding (the reference's only *runnable*
training_dependent configuration, ``--img_base_name resnet50``), and a
google-ViT (HF ``ViTModel``) encoder whose CLS token feeds the linear head
(SuperviseClassifier's ViTModel branch, lib/models/downstream_models.py:92-93
— the shipped ``ViTForImageClassification`` wiring crashes at the fc call,
so the ViTModel intent is reconstructed per SURVEY §7 item 7).

Both are Flax rebuilds with converters from the torch state-dict layouts,
so released torchvision / ``google/vit-base-patch16-224`` checkpoints load
when available. BatchNorm is real (batch statistics in training with
running-average updates, running statistics in eval — torchvision
semantics: momentum 0.1, eps 1e-5), carried in the standard
``batch_stats`` collection.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# torchvision-layout ResNet-50 (He et al. v1.5: stride on the 3x3 conv)


class TvBottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 reduce -> 3x3 (stride here) -> 1x1 x4
    expand, BN after every conv, ReLU after the residual add."""

    width: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.width, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(4 * self.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            identity = nn.Conv(4 * self.width, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(y + identity)


class TvResNet50(nn.Module):
    """torchvision ``models.resnet50`` with the reference's 768-d fc head
    replacement (lib/models/utils.py:50-53: ``fc = nn.Linear(2048, 768)``).
    Returns the (B, embed_dim) fc output."""

    embed_dim: int = 768
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64  # stem width; halve for test-scale configs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels, train: bool = False):
        x = pixels.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="bn1")(x))
        # torch MaxPool2d(3, stride=2, padding=1)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage, blocks in enumerate(self.stage_sizes):
            w = self.width * (2 ** stage)
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = TvBottleneck(
                    w, stride=stride, downsample=(b == 0), dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1, 1))
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc")(x)


def convert_tv_resnet50(sd, embed_dim: int = 768, stage_sizes=(3, 4, 6, 3)) -> dict:
    """torchvision resnet50 state dict (after the fc replacement) →
    (params, batch_stats) for :class:`TvResNet50`."""

    def conv(k):  # torch (O, I, kh, kw) → flax (kh, kw, I, O)
        return {"kernel": np.ascontiguousarray(np.asarray(sd[f"{k}.weight"], np.float32).transpose(2, 3, 1, 0))}

    def bn(k):
        return (
            {"scale": np.asarray(sd[f"{k}.weight"], np.float32),
             "bias": np.asarray(sd[f"{k}.bias"], np.float32)},
            {"mean": np.asarray(sd[f"{k}.running_mean"], np.float32),
             "var": np.asarray(sd[f"{k}.running_var"], np.float32)},
        )

    params: dict = {"conv1": conv("conv1"), "fc": {
        "kernel": np.ascontiguousarray(np.asarray(sd["fc.weight"], np.float32).T),
        "bias": np.asarray(sd["fc.bias"], np.float32)}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            blk_p: dict = {}
            blk_s: dict = {}
            for c in (1, 2, 3):
                blk_p[f"conv{c}"] = conv(f"{t}.conv{c}")
                blk_p[f"bn{c}"], blk_s[f"bn{c}"] = bn(f"{t}.bn{c}")
            if b == 0:
                blk_p["downsample_conv"] = conv(f"{t}.downsample.0")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn(f"{t}.downsample.1")
            params[f] = blk_p
            stats[f] = blk_s
    assert params["fc"]["kernel"].shape[1] == embed_dim, params["fc"]["kernel"].shape
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# google ViT (HF ViTModel): CLS-token encoder


@dataclasses.dataclass(frozen=True)
class GoogleViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072

    @property
    def image_resolution(self) -> int:  # uniform with ClipConfig/TvResNetSpec
        return self.image_size

    @staticmethod
    def tiny() -> "GoogleViTConfig":
        return GoogleViTConfig(image_size=32, patch_size=8, width=32, layers=2, heads=2, mlp_dim=48)


class GoogleViTBlock(nn.Module):
    heads: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from lemon_tpu.models.clip import FpLayerNorm

        d = x.shape[-1]
        b, l, _ = x.shape
        h = self.heads
        y = FpLayerNorm(epsilon=1e-12, name="ln_before")(x)
        q = nn.Dense(d, dtype=self.dtype, name="query")(y).reshape(b, l, h, d // h)
        k = nn.Dense(d, dtype=self.dtype, name="key")(y).reshape(b, l, h, d // h)
        v = nn.Dense(d, dtype=self.dtype, name="value")(y).reshape(b, l, h, d // h)
        logits = jnp.einsum("blhd,bmhd->bhlm", q * ((d // h) ** -0.5), k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_out")(att)
        y = FpLayerNorm(epsilon=1e-12, name="ln_after")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc")(y)
        y = nn.gelu(y, approximate=False)  # HF 'gelu' is erf-exact
        return x + nn.Dense(d, dtype=self.dtype, name="mlp_out")(y)


class GoogleViTEncoder(nn.Module):
    """HF ViTModel forward up to ``last_hidden_state[:, 0]`` (the CLS
    embedding SuperviseClassifier feeds its head)."""

    cfg: GoogleViTConfig = dataclasses.field(default_factory=GoogleViTConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels, train: bool = False):
        from lemon_tpu.models.clip import FpLayerNorm

        c = self.cfg
        x = nn.Conv(c.width, (c.patch_size,) * 2, strides=(c.patch_size,) * 2,
                    padding="VALID", dtype=self.dtype, name="patch_embedding")(pixels.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, c.width)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.width), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.width)), x], axis=1)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (x.shape[1], c.width), jnp.float32)
        x = x + pos[None].astype(x.dtype)
        for i in range(c.layers):
            x = GoogleViTBlock(c.heads, c.mlp_dim, dtype=self.dtype, name=f"block_{i}")(x)
        x = FpLayerNorm(epsilon=1e-12, name="ln_final")(x)
        return x[:, 0, :]


def convert_hf_vit(sd, cfg: GoogleViTConfig) -> dict:
    """HF ViTModel state dict → GoogleViTEncoder params. Accepts the
    ``vit.``-prefixed ViTForImageClassification layout too (the name
    get_img_base loads, lib/models/utils.py:54-55)."""
    if any(k.startswith("vit.") for k in sd):
        sd = {k[4:]: v for k, v in sd.items() if k.startswith("vit.")}

    def dense(k):
        return {"kernel": np.ascontiguousarray(np.asarray(sd[f"{k}.weight"], np.float32).T),
                "bias": np.asarray(sd[f"{k}.bias"], np.float32)}

    def ln(k):
        return {"scale": np.asarray(sd[f"{k}.weight"], np.float32),
                "bias": np.asarray(sd[f"{k}.bias"], np.float32)}

    p: dict = {
        "patch_embedding": {
            "kernel": np.ascontiguousarray(np.asarray(
                sd["embeddings.patch_embeddings.projection.weight"], np.float32).transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd["embeddings.patch_embeddings.projection.bias"], np.float32),
        },
        "cls_token": np.asarray(sd["embeddings.cls_token"], np.float32),
        "position_embeddings": np.asarray(sd["embeddings.position_embeddings"], np.float32)[0],
        "ln_final": ln("layernorm"),
    }
    for i in range(cfg.layers):
        hf = f"encoder.layer.{i}"
        p[f"block_{i}"] = {
            "ln_before": ln(f"{hf}.layernorm_before"),
            "query": dense(f"{hf}.attention.attention.query"),
            "key": dense(f"{hf}.attention.attention.key"),
            "value": dense(f"{hf}.attention.attention.value"),
            "attn_out": dense(f"{hf}.attention.output.dense"),
            "ln_after": ln(f"{hf}.layernorm_after"),
            "mlp_fc": dense(f"{hf}.intermediate.dense"),
            "mlp_out": dense(f"{hf}.output.dense"),
        }
    return {"params": p}
