"""BERT-style text tower (for BiomedCLIP-family encoders).

The reference's 'biomed_clip' option (lib/models/utils.py:72-79) loads
open_clip's BiomedCLIP-PubMedBERT_256-vit_base_patch16_224: a ViT-B/16
vision tower (already covered by lemon_tpu.models.clip.VisionTower) paired
with a PubMedBERT text encoder behind open_clip's HFTextEncoder (CLS-token
pooling + a projection head). This module provides the Flax BERT encoder +
pooling/projection and a converter from HuggingFace ``BertModel`` state
dicts; head wiring (pooling mode, linear vs MLP projection) is configurable
and validated against checkpoint shapes at load time.

Architecture (BERT-base post-LN): embeddings (word + position + token-type,
LayerNorm) -> N layers of [self-attention -> add&LN -> FFN(gelu) ->
add&LN] -> pooling -> projection to the shared CLIP space.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lemon_tpu.models.clip import FpLayerNorm


@dataclasses.dataclass(frozen=True)
class BertTextConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    context_length: int = 256
    embed_dim: int = 512  # shared CLIP space
    pooling: str = "cls"  # 'cls' | 'mean'
    projection: str = "mlp"  # 'linear' | 'mlp' (open_clip BiomedCLIP uses mlp)

    @staticmethod
    def pubmedbert(embed_dim: int = 512) -> "BertTextConfig":
        return BertTextConfig(embed_dim=embed_dim)

    @staticmethod
    def tiny() -> "BertTextConfig":
        return BertTextConfig(
            vocab_size=200, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=32,
            context_length=16, embed_dim=16,
        )


class BertLayer(nn.Module):
    cfg: BertTextConfig
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        d = c.hidden_size
        h = c.num_heads
        b, l, _ = x.shape

        q = nn.Dense(d, dtype=self.compute_dtype, name="q")(x).reshape(b, l, h, d // h)
        k = nn.Dense(d, dtype=self.compute_dtype, name="k")(x).reshape(b, l, h, d // h)
        v = nn.Dense(d, dtype=self.compute_dtype, name="v")(x).reshape(b, l, h, d // h)
        logits = jnp.einsum("blhd,bmhd->bhlm", q * ((d // h) ** -0.5), k, preferred_element_type=jnp.float32)
        logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, d)
        att = nn.Dense(d, dtype=self.compute_dtype, name="attn_out")(att)
        x = FpLayerNorm(epsilon=1e-12, name="ln_attn")(x + att)

        y = nn.Dense(c.intermediate_size, dtype=self.compute_dtype, name="ffn_in")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.compute_dtype, name="ffn_out")(y)
        return FpLayerNorm(epsilon=1e-12, name="ln_ffn")(x + y)


class BertTextTower(nn.Module):
    cfg: BertTextConfig
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, attention_mask=None):
        """tokens: (B, L) int32; attention_mask: (B, L) 1=real, 0=pad
        (defaults to tokens != 0, the BERT pad id)."""
        c = self.cfg
        b, l = tokens.shape
        if attention_mask is None:
            attention_mask = (tokens != 0).astype(jnp.int32)

        word = self.param("word_embeddings", nn.initializers.normal(0.02), (c.vocab_size, c.hidden_size), jnp.float32)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02), (c.max_position_embeddings, c.hidden_size), jnp.float32)
        typ = self.param("token_type_embeddings", nn.initializers.normal(0.02), (c.type_vocab_size, c.hidden_size), jnp.float32)
        x = jnp.take(word, tokens, axis=0) + pos[None, :l] + typ[None, 0][:, None, :]
        x = FpLayerNorm(epsilon=1e-12, name="ln_emb")(x.astype(self.compute_dtype))

        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf).astype(jnp.float32)
        for i in range(c.num_layers):
            x = BertLayer(c, compute_dtype=self.compute_dtype, name=f"layer_{i}")(x, bias)

        if c.pooling == "cls":
            pooled = x[:, 0, :]
        else:
            mask = attention_mask[:, :, None].astype(x.dtype)
            pooled = (x * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)

        if c.projection == "linear":
            return nn.Dense(c.embed_dim, use_bias=False, dtype=self.compute_dtype, name="proj")(pooled)
        y = nn.Dense((c.hidden_size + c.embed_dim) // 2, dtype=self.compute_dtype, name="proj_fc")(pooled)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Dense(c.embed_dim, use_bias=False, dtype=self.compute_dtype, name="proj_out")(y)


def bert_params_from_hf(sd: Mapping[str, np.ndarray], cfg: BertTextConfig) -> dict:
    """Convert a HuggingFace BertModel state dict (optionally prefixed, as
    in open_clip's text.transformer.*) into BertTextTower params. Projection
    head params (open_clip text.proj.*) are mapped when present."""
    pfx = ""
    if not any(k.startswith("embeddings.") for k in sd):
        for cand in ("bert.", "text.transformer.", "transformer."):
            if any(k.startswith(cand + "embeddings.") for k in sd):
                pfx = cand
                break
    g = lambda name: np.asarray(sd[pfx + name])

    params = {
        "word_embeddings": g("embeddings.word_embeddings.weight"),
        "position_embeddings": g("embeddings.position_embeddings.weight"),
        "token_type_embeddings": g("embeddings.token_type_embeddings.weight"),
        "ln_emb": {"scale": g("embeddings.LayerNorm.weight"), "bias": g("embeddings.LayerNorm.bias")},
    }
    for i in range(cfg.num_layers):
        lp = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "q": {"kernel": g(lp + "attention.self.query.weight").T, "bias": g(lp + "attention.self.query.bias")},
            "k": {"kernel": g(lp + "attention.self.key.weight").T, "bias": g(lp + "attention.self.key.bias")},
            "v": {"kernel": g(lp + "attention.self.value.weight").T, "bias": g(lp + "attention.self.value.bias")},
            "attn_out": {"kernel": g(lp + "attention.output.dense.weight").T, "bias": g(lp + "attention.output.dense.bias")},
            "ln_attn": {"scale": g(lp + "attention.output.LayerNorm.weight"), "bias": g(lp + "attention.output.LayerNorm.bias")},
            "ffn_in": {"kernel": g(lp + "intermediate.dense.weight").T, "bias": g(lp + "intermediate.dense.bias")},
            "ffn_out": {"kernel": g(lp + "output.dense.weight").T, "bias": g(lp + "output.dense.bias")},
            "ln_ffn": {"scale": g(lp + "output.LayerNorm.weight"), "bias": g(lp + "output.LayerNorm.bias")},
        }
    # open_clip projection head (text.proj.{0,2}.weight for mlp)
    if "text.proj.weight" in sd:
        params["proj"] = {"kernel": np.asarray(sd["text.proj.weight"]).T}
    elif "text.proj.0.weight" in sd:
        params["proj_fc"] = {"kernel": np.asarray(sd["text.proj.0.weight"]).T, "bias": np.asarray(sd["text.proj.0.bias"])}
        params["proj_out"] = {"kernel": np.asarray(sd["text.proj.2.weight"]).T}
    return {"params": params}
