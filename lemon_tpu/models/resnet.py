"""Flax ModifiedResNet vision tower (OpenAI CLIP RN-family).

TPU port of the reference's ModifiedResNet
(/root/reference/lib/models/chexzero_clip.py:34-174):

- 3-conv stem (stride 2 then 1, 1) + 2x2 average pool;
- Bottleneck blocks where every conv has stride 1 and an average pool
  implements downsampling (anti-aliased striding), including a pool
  prepended to the 1x1 downsample projection;
- final pooling is QKV attention over the 7x7 feature map with a learned
  positional embedding and a mean-token query (AttentionPool2d,
  chexzero_clip.py:81-117).

TPU-first choices: NHWC layout throughout (XLA's native conv layout),
BatchNorm folded to an affine transform at inference (the encoder is frozen
in every reference use of RN checkpoints — model.eval(); running stats are
ordinary parameters so checkpoint conversion is a rename), and the attention
pool computes only the one output token the reference keeps (query = mean
token instead of the full (HW+1)-query attention whose rows 1.. are
discarded at chexzero_clip.py:117).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d: normalize with running stats (fp32),
    cast back to the compute dtype."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (f,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (f,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        return (x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype))


def _conv(features: int, kernel: int, stride: int = 1, name: str | None = None, dtype=jnp.float32):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    """chexzero_clip.py:34-78; expansion 4, avgpool-based striding."""

    planes: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    EXPANSION = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.EXPANSION
        dt = self.compute_dtype
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(_conv(self.planes, 1, name="conv1", dtype=dt)(x)))
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(_conv(self.planes, 3, name="conv2", dtype=dt)(y)))
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride, self.stride), (self.stride, self.stride))
        y = FrozenBatchNorm(out_ch, name="bn3")(_conv(out_ch, 1, name="conv3", dtype=dt)(y))

        identity = x
        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = x
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride), (self.stride, self.stride))
            identity = _conv(out_ch, 1, name="down_conv", dtype=dt)(identity)
            identity = FrozenBatchNorm(out_ch, name="down_bn")(identity)
        return nn.relu(y + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pool (chexzero_clip.py:81-117). Only the mean-token
    query is computed — identical to the reference's x[0] output."""

    num_heads: int
    output_dim: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        dt = self.compute_dtype
        x = x.reshape(b, h * w, c)
        x = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)  # (B, HW+1, C)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(c ** -0.5), (h * w + 1, c), jnp.float32
        )
        x = x + pos.astype(x.dtype)

        q = nn.Dense(c, dtype=dt, name="q_proj")(x[:, :1])
        k = nn.Dense(c, dtype=dt, name="k_proj")(x)
        v = nn.Dense(c, dtype=dt, name="v_proj")(x)
        nh = self.num_heads
        hd = c // nh
        q = q.reshape(b, 1, nh, hd)
        k = k.reshape(b, h * w + 1, nh, hd)
        v = v.reshape(b, h * w + 1, nh, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, 1, c)
        return nn.Dense(self.output_dim, dtype=dt, name="c_proj")(out)[:, 0]


class ResNetVisionTower(nn.Module):
    """ModifiedResNet (chexzero_clip.py:120-174). ``cfg.vision_layers`` is
    the 4-tuple of Bottleneck counts; feature width doubles per stage and
    the final embed dim is ``width * 32``."""

    cfg: Any  # ClipConfig with vision_layers: Tuple[int, int, int, int]
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        layers: Tuple[int, ...] = tuple(cfg.vision_layers)
        width = cfg.vision_width
        x = pixels.astype(self.compute_dtype)

        # 3-conv stem + avgpool (chexzero_clip.py:133-141,160-166)
        x = nn.relu(FrozenBatchNorm(width // 2, name="stem_bn1")(_conv(width // 2, 3, 2, "stem_conv1", self.compute_dtype)(x)))
        x = nn.relu(FrozenBatchNorm(width // 2, name="stem_bn2")(_conv(width // 2, 3, 1, "stem_conv2", self.compute_dtype)(x)))
        x = nn.relu(FrozenBatchNorm(width, name="stem_bn3")(_conv(width, 3, 1, "stem_conv3", self.compute_dtype)(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for stage, n_blocks in enumerate(layers):
            planes = width * (2 ** stage)
            for j in range(n_blocks):
                stride = 2 if (stage > 0 and j == 0) else 1
                x = Bottleneck(
                    planes, stride=stride, compute_dtype=self.compute_dtype,
                    name=f"layer{stage + 1}_{j}",
                )(x)

        return AttentionPool2d(
            num_heads=cfg.v_heads,
            output_dim=cfg.embed_dim,
            compute_dtype=self.compute_dtype,
            name="attnpool",
        )(x)
