"""BLIP-2-faithful captioner: frozen vision tower → Q-Former → causal LM.

The reference's downstream captioner fine-tunes HuggingFace BLIP-2 with
peft LoRA r=16 applied to ``q_proj``/``k_proj``
(lib/downstream/downstream_captioning.py:216-224, lib/models/utils.py:27-46).
Round 1 shipped a GIT-style prefix captioner (models/captioner.py) as a
capability substitute; this module closes the architectural gap with the
BLIP-2 component layout:

- a frozen vision tower (BLIP-2 freezes its image encoder; gated by
  ``freeze_vision``),
- **N learned query tokens** refined by a BERT-style (post-LN) Q-Former
  whose blocks cross-attend to the frozen image token states every
  ``cross_attention_freq`` layers (BLIP-2 uses 32 queries, freq 2),
- a linear ``language_projection`` of the query outputs into the LM width,
- a causal LM over [projected queries, BOS, caption] with **separate
  q/k/v projections and LoRA adapters on q and k only** — the reference's
  exact adapter placement, vs. the GIT-style model's fused-QKV adapter.

Interface-compatible with :class:`~lemon_tpu.models.captioner.CaptioningModel`
(``__call__``/``per_sample_loss``/``generate``), so the downstream trainer
(train/captioning.py) switches architecture purely through the config type.
tests/test_qformer.py compares both architectures on a shared
loss-based-detection metric.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lemon_tpu.models.captioner import CaptionerConfig, CaptioningModel, LoraDense
from lemon_tpu.models.clip import ClipConfig, FpLayerNorm, VisionTower, quick_gelu


@dataclasses.dataclass(frozen=True)
class QFormerConfig(CaptionerConfig):
    """``decoder_*`` fields configure the LM; ``qformer_*`` the Q-Former."""

    n_queries: int = 32
    qformer_width: int = 64
    qformer_layers: int = 2
    qformer_heads: int = 2
    cross_attention_freq: int = 2
    freeze_vision: bool = True

    @property
    def n_image_tokens(self) -> int:  # the LM prefix is the query set
        return self.n_queries

    @staticmethod
    def tiny() -> "QFormerConfig":
        return QFormerConfig(vocab_size=512, n_queries=8)

    @staticmethod
    def base() -> "QFormerConfig":
        return QFormerConfig(
            vision=ClipConfig.vit_b32(),
            decoder_width=512,
            decoder_layers=6,
            decoder_heads=8,
            max_text_len=40,
            n_queries=32,
            qformer_width=768,
            qformer_layers=12,
            qformer_heads=12,
            lora_rank=16,
        )


def _mha(q, k, v, heads: int, mask=None):
    """(B, Lq, D) x (B, Lk, D) multi-head attention; fp32 logits."""
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // heads
    q = q.reshape(b, lq, heads, hd)
    k = k.reshape(b, lk, heads, hd)
    v = v.reshape(b, lk, heads, hd)
    logits = jnp.einsum("blhd,bmhd->bhlm", q * (hd ** -0.5), k, preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, lq, d)


class QFormerBlock(nn.Module):
    """BERT-style post-LN block: self-attn over the queries, optional
    cross-attn to the image token states, GELU MLP."""

    heads: int
    has_cross: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, img):
        d = x.shape[-1]
        q = nn.Dense(d, dtype=self.dtype, name="self_q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="self_k")(x)
        v = nn.Dense(d, dtype=self.dtype, name="self_v")(x)
        att = nn.Dense(d, dtype=self.dtype, name="self_out")(_mha(q, k, v, self.heads))
        x = FpLayerNorm(name="ln_self")(x + att)
        if self.has_cross:
            q = nn.Dense(d, dtype=self.dtype, name="cross_q")(x)
            k = nn.Dense(d, dtype=self.dtype, name="cross_k")(img)
            v = nn.Dense(d, dtype=self.dtype, name="cross_v")(img)
            att = nn.Dense(d, dtype=self.dtype, name="cross_out")(_mha(q, k, v, self.heads))
            x = FpLayerNorm(name="ln_cross")(x + att)
        y = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc")(x)
        y = nn.Dense(d, dtype=self.dtype, name="mlp_proj")(nn.gelu(y))
        return FpLayerNorm(name="ln_mlp")(x + y)


class LMBlock(nn.Module):
    """Pre-LN causal LM block with separate q/k/v projections; LoRA
    adapters sit on q_proj and k_proj only (downstream_captioning.py:220:
    ``target_modules=["q_proj", "k_proj"]``)."""

    heads: int
    lora_rank: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = x.shape[-1]
        y = FpLayerNorm(name="ln_1")(x)
        q = LoraDense(d, rank=self.lora_rank, dtype=self.dtype, name="q_proj")(y)
        k = LoraDense(d, rank=self.lora_rank, dtype=self.dtype, name="k_proj")(y)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(y)
        x = x + nn.Dense(d, dtype=self.dtype, name="out")(_mha(q, k, v, self.heads, mask))
        y = FpLayerNorm(name="ln_2")(x)
        y = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(d, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class QFormerCaptioner(CaptioningModel):
    """Inherits ``__call__``/``per_sample_loss``/``generate`` (and the
    prefix-LM mask in ``_decode``) from :class:`CaptioningModel`; only the
    prefix encoder and the LM block type differ."""

    def setup(self):
        c = self.cfg
        self.visual = VisionTower(c.vision, compute_dtype=self.compute_dtype)
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02), (c.n_queries, c.qformer_width), jnp.float32
        )
        self.qformer_blocks = [
            QFormerBlock(
                c.qformer_heads,
                has_cross=(i % c.cross_attention_freq == 0),
                dtype=self.compute_dtype,
                name=f"qformer_block_{i}",
            )
            for i in range(c.qformer_layers)
        ]
        self.language_projection = nn.Dense(c.decoder_width, dtype=self.compute_dtype)
        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02), (c.vocab_size, c.decoder_width), jnp.float32
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.n_queries + c.max_text_len, c.decoder_width),
            jnp.float32,
        )
        self.blocks = [
            LMBlock(c.decoder_heads, lora_rank=c.lora_rank, dtype=self.compute_dtype, name=f"lm_block_{i}")
            for i in range(c.decoder_layers)
        ]
        self.ln_final = FpLayerNorm()
        self.lm_head = nn.Dense(c.vocab_size, use_bias=False, dtype=self.compute_dtype)

    def encode_image_prefix(self, pixels):
        img = self.visual(pixels, return_tokens=True).astype(self.compute_dtype)
        if self.cfg.freeze_vision:
            img = jax.lax.stop_gradient(img)
        x = jnp.broadcast_to(
            self.query_tokens[None].astype(self.compute_dtype),
            (pixels.shape[0],) + self.query_tokens.shape,
        )
        for block in self.qformer_blocks:
            x = block(x, img)
        return self.language_projection(x)
