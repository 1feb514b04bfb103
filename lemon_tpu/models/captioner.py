"""Image captioning model: CLIP vision prefix + causal text decoder.

TPU-native counterpart of the reference's captioning stack (BLIP-2 / GIT
via HuggingFace, lib/models/utils.py:27-46, lib/downstream/
downstream_captioning.py). GIT-style architecture: the vision tower's token
states are projected into the decoder width and prepended as a prefix; the
decoder is a causal transformer over [image tokens, BOS, caption tokens]
with text-position-only LM loss. Capabilities ported:

- per-sample shifted LM loss (loss-based detection mode,
  downstream_captioning.py:51-79)
- LoRA adapters on the attention QKV projections (the reference applies
  peft-LoRA r=16 to q/k_proj of BLIP-2, :216-224) via :class:`LoraDense` —
  base kernels stay frozen, only A/B factors (and the head) train
- fixed-length greedy/temperature sampling under ``lax.scan`` (static
  shapes; generation stops contribute padding after EOT)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lemon_tpu.models.clip import ClipConfig, FpLayerNorm, VisionTower, quick_gelu


class LoraDense(nn.Module):
    """Dense with an optional low-rank adapter: y = x W + x A B * (alpha/r).

    With ``rank=0`` this is a plain Dense. The base kernel is created under
    the same parameter names as ``nn.Dense`` so pretrained weights load
    unchanged; freezing logic keys off the ``lora_a``/``lora_b`` names.
    """

    features: int
    rank: int = 0
    alpha: float = 16.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype)) + bias.astype(self.dtype)
        if self.rank > 0:
            a = self.param("lora_a", nn.initializers.normal(0.02), (x.shape[-1], self.rank), jnp.float32)
            b = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features), jnp.float32)
            y = y + jnp.dot(jnp.dot(x.astype(self.dtype), a.astype(self.dtype)), b.astype(self.dtype)) * (
                self.alpha / self.rank
            )
        return y


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    vision: ClipConfig = dataclasses.field(default_factory=ClipConfig.tiny)
    decoder_width: int = 64
    decoder_layers: int = 2
    decoder_heads: int = 2
    max_text_len: int = 32
    vocab_size: int = 49408
    lora_rank: int = 0  # applied to decoder attention QKV
    # token ids used by per_sample_loss/generation defaults (the CLIP-BPE
    # captioners pad with 0; OPT-based BLIP-2 pads with 1, BOS/EOS 2)
    pad_token_id: int = 0
    bos_token_id: int = 0
    eos_token_id: int = 0

    @property
    def n_image_tokens(self) -> int:
        return self.vision.grid ** 2 + 1

    @staticmethod
    def tiny() -> "CaptionerConfig":
        return CaptionerConfig(vocab_size=512)

    @staticmethod
    def base() -> "CaptionerConfig":
        return CaptionerConfig(
            vision=ClipConfig.vit_b32(),
            decoder_width=512,
            decoder_layers=6,
            decoder_heads=8,
            max_text_len=40,
        )


class DecoderBlock(nn.Module):
    heads: int
    lora_rank: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = x.shape[-1]
        h = self.heads
        y = FpLayerNorm(name="ln_1")(x)
        qkv = LoraDense(3 * d, rank=self.lora_rank, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, l, _ = y.shape
        q = q.reshape(b, l, h, d // h)
        k = k.reshape(b, l, h, d // h)
        v = v.reshape(b, l, h, d // h)
        logits = jnp.einsum("blhd,bmhd->bhlm", q * ((d // h) ** -0.5), k, preferred_element_type=jnp.float32)
        logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out")(att)
        y = FpLayerNorm(name="ln_2")(x)
        y = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(d, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class CaptioningModel(nn.Module):
    cfg: CaptionerConfig
    compute_dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.visual = VisionTower(c.vision, compute_dtype=self.compute_dtype)
        self.vision_proj = nn.Dense(c.decoder_width, dtype=self.compute_dtype)
        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02), (c.vocab_size, c.decoder_width), jnp.float32
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.n_image_tokens + c.max_text_len, c.decoder_width),
            jnp.float32,
        )
        self.blocks = [
            DecoderBlock(c.decoder_heads, lora_rank=c.lora_rank, dtype=self.compute_dtype, name=f"block_{i}")
            for i in range(c.decoder_layers)
        ]
        self.ln_final = FpLayerNorm()
        self.lm_head = nn.Dense(c.vocab_size, use_bias=False, dtype=self.compute_dtype)

    def _decode(self, image_tokens, text_tokens):
        """Logits over the text positions. Image prefix attends bidirection-
        ally; text attends causally (and to the whole prefix)."""
        c = self.cfg
        b = text_tokens.shape[0]
        n_img = image_tokens.shape[1]
        l_txt = text_tokens.shape[1]
        txt = jnp.take(self.token_embedding, text_tokens, axis=0).astype(self.compute_dtype)
        seq = jnp.concatenate([image_tokens, txt], axis=1)
        seq = seq + self.positional_embedding[: n_img + l_txt].astype(seq.dtype)

        total = n_img + l_txt
        pos = jnp.arange(total)
        is_txt = pos >= n_img
        # allowed(i, j): j is prefix, or (both text and j <= i)
        allowed = (~is_txt[None, :]) | ((is_txt[:, None] & is_txt[None, :]) & (pos[None, :] <= pos[:, None]))
        mask = jnp.where(allowed, 0.0, -jnp.inf)[None, None, :, :]

        x = seq
        for block in self.blocks:
            x = block(x, mask)
        x = self.ln_final(x)
        return self.lm_head(x[:, n_img:, :])

    def encode_image_prefix(self, pixels):
        tokens = self.visual(pixels, return_tokens=True)
        return self.vision_proj(tokens.astype(self.compute_dtype))

    def __call__(self, pixels, text_tokens):
        """Logits (B, L_text, V) for teacher forcing."""
        prefix = self.encode_image_prefix(pixels)
        return self._decode(prefix, text_tokens)

    def per_sample_loss(self, pixels, text_tokens, pad_id: Optional[int] = None):
        """Shifted LM loss per example (downstream_captioning.py:51-79):
        predict token t+1 from tokens <= t; padding positions masked out."""
        if pad_id is None:
            pad_id = self.cfg.pad_token_id
        logits = self(pixels, text_tokens)
        targets = text_tokens[:, 1:]
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(logp, targets[:, :, None], axis=2)[:, :, 0]
        mask = (targets != pad_id).astype(jnp.float32)
        return -(tok_lp * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)

    def generate(self, pixels, bos_id: int, eot_id: int, max_len: Optional[int] = None, temperature: float = 0.0, rng: Optional[jax.Array] = None):
        """Fixed-length generation under lax.scan. temperature 0 = greedy."""
        c = self.cfg
        max_len = max_len or c.max_text_len
        # the decoder's positional table covers n_image_tokens + max_text_len
        # rows; a longer request would under-broadcast deep inside the scan
        assert max_len <= c.max_text_len, (
            f"max_len {max_len} exceeds the decoder's max_text_len {c.max_text_len}"
        )
        prefix = self.encode_image_prefix(pixels)
        b = prefix.shape[0]
        tokens = jnp.full((b, max_len), 0, jnp.int32).at[:, 0].set(bos_id)

        def step(carry, t):
            tokens, done, key = carry
            logits = self._decode(prefix, tokens)  # (B, L, V)
            step_logits = logits[:, t, :]
            if temperature > 0:
                key, sub = jax.random.split(key)
                nxt = jax.random.categorical(sub, step_logits / temperature, axis=-1)
            else:
                nxt = jnp.argmax(step_logits, axis=-1)
            nxt = jnp.where(done, 0, nxt).astype(jnp.int32)
            done = done | (nxt == eot_id)
            tokens = jax.lax.dynamic_update_slice_in_dim(tokens.T, nxt[None, :], t + 1, 0).T
            return (tokens, done, key), ()

        key = rng if rng is not None else jax.random.PRNGKey(0)
        (tokens, _, _), _ = jax.lax.scan(
            step, (tokens, jnp.zeros(b, bool), key), jnp.arange(max_len - 1)
        )
        return tokens


def init_captioner(cfg: CaptionerConfig, seed: int = 0):
    """Build the captioner matching the config type: a ``Blip2Config``
    selects the HF-exact convertible architecture (models/blip2.py), a
    ``QFormerConfig`` the from-scratch BLIP-2-faithful one
    (models/qformer.py), a plain ``CaptionerConfig`` the GIT-style prefix
    model."""
    from lemon_tpu.models.blip2 import Blip2Captioner, Blip2Config
    from lemon_tpu.models.qformer import QFormerCaptioner, QFormerConfig

    if isinstance(cfg, Blip2Config):
        cls = Blip2Captioner
    elif isinstance(cfg, QFormerConfig):
        cls = QFormerCaptioner
    else:
        cls = CaptioningModel
    model = cls(cfg)
    pixels = jnp.zeros((1, cfg.vision.image_resolution, cfg.vision.image_resolution, 3), jnp.float32)
    tokens = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), pixels, tokens)
    return model, params


def lora_trainable_mask(params) -> Any:
    """Pytree of bools: True for LoRA factors and the LM head (the trainable
    set under LoRA fine-tuning); everything else frozen."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path) -> bool:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(n) for n in names)
        return "lora_a" in joined or "lora_b" in joined or "lm_head" in joined

    from jax.tree_util import tree_unflatten, tree_structure

    leaves = [trainable(path) for path, _ in flat]
    return tree_unflatten(tree_structure(params), leaves)


def frozen_vision_mask(params) -> Any:
    """Pytree of bools: True for every param OUTSIDE the vision tower.

    ``freeze_vision`` stop-gradients the tower, but a zero gradient is not
    a zero UPDATE under AdamW — its decoupled weight decay still shrinks
    the params every step. The optimizer must be masked so the frozen
    encoder's weights are bit-stable (BLIP-2's frozen-image-encoder
    contract; downstream_captioning.py:216-224 freezes via requires_grad,
    which in torch removes the params from the optimizer entirely)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def outside_visual(path) -> bool:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        return "visual" not in names

    from jax.tree_util import tree_structure, tree_unflatten

    leaves = [outside_visual(path) for path, _ in flat]
    return tree_unflatten(tree_structure(params), leaves)
