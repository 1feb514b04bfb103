"""HF-BLIP-2-exact captioner (vision ViT → Q-Former → OPT LM) + converter.

The reference's downstream captioner LoRA-finetunes a *pretrained*
``Salesforce/blip2-opt-2.7b`` (lib/models/utils.py:27-46,
lib/downstream/downstream_captioning.py:92,216-224). The from-scratch
Q-Former captioner (models/qformer.py) is architecturally faithful but
trains from random init; this module closes the pretrained-weight gap the
same way models/loader.py does for CLIP and baselines/capfilt.py for
BLIP-ITM: a Flax rebuild that matches HF ``Blip2ForConditionalGeneration``
(OPT language model) activation-for-activation, plus
:func:`load_blip2` to convert a local HF checkpoint into its parameters.

Architecture notes (all verified against the HF module layout):

- **Vision tower**: BLIP-2's EVA-style ViT — conv patch embed + CLS + pos
  embed (NO pre-LN, unlike CLIP), pre-LN blocks with a fused ``qkv``
  projection and erf-GELU MLP, ``post_layernorm`` over all tokens
  (eps 1e-6).
- **Q-Former**: input LayerNorm (eps 1e-12) over the learned query tokens,
  then BERT-style post-LN blocks: self-attention, cross-attention to the
  image token states every ``cross_attention_freq`` layers, and the
  query-path MLP (``intermediate_query``/``output_query`` — the text-path
  weights are never used in captioning and are not modeled).
- **OPT decoder**: learned positions with the OPT +2 offset, pre-LN blocks
  (``do_layer_norm_before=True``) with ReLU MLPs, causal masking over the
  FULL [projected queries, text] sequence (the HF decoder is causal over
  everything — the query prefix does NOT attend bidirectionally, unlike
  the GIT-style prefix mask in models/captioner.py), final LayerNorm, and
  a logit head TIED to ``embed_tokens`` (no separate lm_head parameter, so
  fine-tuning cannot silently untie it).
- **LoRA** adapters sit on the OPT ``q_proj``/``k_proj`` only — peft's
  ``target_modules=["q_proj", "k_proj"]`` (downstream_captioning.py:220)
  matches exactly those module names in the HF tree (the vision tower uses
  ``qkv``, the Q-Former ``query``/``key``/``value``).

Interface-compatible with :class:`~lemon_tpu.models.captioner
.CaptioningModel` (``__call__``/``per_sample_loss``/``generate`` are
inherited), so train/captioning.py drives it unchanged.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lemon_tpu.models.captioner import CaptionerConfig, CaptioningModel, LoraDense
from lemon_tpu.models.clip import ClipConfig, FpLayerNorm


@dataclasses.dataclass(frozen=True)
class Blip2Config(CaptionerConfig):
    """``vision`` carries the ViT dims (resolution/width/layers/patch/heads);
    ``decoder_*`` the OPT dims; ``qformer_*`` the Q-Former. ``*_mlp_dim=0``
    means the conventional 4x width (BLIP-2's released towers deviate:
    ViT-g uses 6144 on width 1408)."""

    vision_mlp_dim: int = 0
    n_queries: int = 32
    qformer_width: int = 768
    qformer_layers: int = 12
    qformer_heads: int = 12
    qformer_mlp_dim: int = 0
    cross_attention_freq: int = 2
    decoder_mlp_dim: int = 0
    max_positions: int = 0  # OPT position-table rows minus the +2 offset; 0 = max_text_len + n_queries
    freeze_vision: bool = True  # BLIP-2's image encoder is always frozen

    @property
    def n_image_tokens(self) -> int:
        return self.n_queries

    @staticmethod
    def tiny() -> "Blip2Config":
        return Blip2Config(
            vision=ClipConfig(image_resolution=56, vision_width=32, vision_layers=2,
                              vision_heads=2, vision_patch_size=14),
            vocab_size=120, decoder_width=32, decoder_layers=2, decoder_heads=2,
            max_text_len=16, n_queries=4, qformer_width=32, qformer_layers=2,
            qformer_heads=2, pad_token_id=1, bos_token_id=2, eos_token_id=2,
        )


class Blip2VisionBlock(nn.Module):
    heads: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        b, l, _ = x.shape
        h = self.heads
        y = FpLayerNorm(epsilon=1e-6, name="layer_norm1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(y)
        # HF Blip2Attention: reshape(B, L, 3, H, hd) then unbind axis 2
        qkv = qkv.reshape(b, l, 3, h, d // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("blhd,bmhd->bhlm", q * ((d // h) ** -0.5), k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="projection")(att)
        y = FpLayerNorm(epsilon=1e-6, name="layer_norm2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # HF hidden_act 'gelu' is erf-exact
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(y)


class Blip2VisionTower(nn.Module):
    cfg: ClipConfig
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        d = c.vision_width
        x = nn.Conv(d, kernel_size=(c.vision_patch_size,) * 2,
                    strides=(c.vision_patch_size,) * 2, padding="VALID",
                    dtype=self.dtype, name="patch_embedding")(pixels)
        b = x.shape[0]
        x = x.reshape(b, -1, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, d)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], d), jnp.float32)
        x = x + pos[None].astype(x.dtype)
        heads = c.vision_heads or d // 64
        for i in range(int(c.vision_layers)):
            x = Blip2VisionBlock(heads, self.mlp_dim, dtype=self.dtype, name=f"block_{i}")(x)
        return FpLayerNorm(epsilon=1e-6, name="post_layernorm")(x)


def _bert_mha(q, k, v, heads: int):
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // heads
    q = q.reshape(b, lq, heads, hd)
    k = k.reshape(b, lk, heads, hd)
    v = v.reshape(b, lk, heads, hd)
    logits = jnp.einsum("blhd,bmhd->bhlm", q * (hd ** -0.5), k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, lq, d)


class Blip2QFormerBlock(nn.Module):
    """Post-LN BERT block over the query tokens (query-only path: the
    feed-forward uses the ``intermediate_query``/``output_query`` weights)."""

    heads: int
    mlp_dim: int
    has_cross: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, img):
        d = x.shape[-1]
        q = nn.Dense(d, dtype=self.dtype, name="self_query")(x)
        k = nn.Dense(d, dtype=self.dtype, name="self_key")(x)
        v = nn.Dense(d, dtype=self.dtype, name="self_value")(x)
        att = nn.Dense(d, dtype=self.dtype, name="self_out")(_bert_mha(q, k, v, self.heads))
        x = FpLayerNorm(epsilon=1e-12, name="ln_self")(att + x)
        if self.has_cross:
            q = nn.Dense(d, dtype=self.dtype, name="cross_query")(x)
            k = nn.Dense(d, dtype=self.dtype, name="cross_key")(img)
            v = nn.Dense(d, dtype=self.dtype, name="cross_value")(img)
            att = nn.Dense(d, dtype=self.dtype, name="cross_out")(_bert_mha(q, k, v, self.heads))
            x = FpLayerNorm(epsilon=1e-12, name="ln_cross")(att + x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="intermediate_query")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.dtype, name="output_query")(y)
        return FpLayerNorm(epsilon=1e-12, name="ln_output")(y + x)


class OptBlock(nn.Module):
    """Pre-LN OPT decoder layer: LoRA on q_proj/k_proj only
    (downstream_captioning.py:220), ReLU MLP."""

    heads: int
    mlp_dim: int
    lora_rank: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = x.shape[-1]
        y = FpLayerNorm(name="self_attn_layer_norm")(x)
        q = LoraDense(d, rank=self.lora_rank, dtype=self.dtype, name="q_proj")(y)
        k = LoraDense(d, rank=self.lora_rank, dtype=self.dtype, name="k_proj")(y)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(y)
        b, l, _ = y.shape
        h = self.heads
        hd = d // h
        qh = q.reshape(b, l, h, hd)
        kh = k.reshape(b, l, h, hd)
        vh = v.reshape(b, l, h, hd)
        logits = jnp.einsum("blhd,bmhd->bhlm", qh * (hd ** -0.5), kh,
                            preferred_element_type=jnp.float32)
        logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        att = jnp.einsum("bhlm,bmhd->blhd", probs, vh).reshape(b, l, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(att)
        y = FpLayerNorm(name="final_layer_norm")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(y)


class Blip2Captioner(CaptioningModel):
    """``__call__``/``per_sample_loss``/``generate`` inherit from
    :class:`CaptioningModel`; the prefix encoder and decoder are the
    HF-exact towers above."""

    def setup(self):
        c: Blip2Config = self.cfg
        self.visual_tower = Blip2VisionTower(
            c.vision, c.vision_mlp_dim or 4 * c.vision.vision_width,
            dtype=self.compute_dtype, name="visual",
        )
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02), (c.n_queries, c.qformer_width), jnp.float32
        )
        self.qformer_input_ln = FpLayerNorm(epsilon=1e-12)
        self.qformer_blocks = [
            Blip2QFormerBlock(
                c.qformer_heads, c.qformer_mlp_dim or 4 * c.qformer_width,
                has_cross=(i % c.cross_attention_freq == 0),
                dtype=self.compute_dtype, name=f"qformer_block_{i}",
            )
            for i in range(c.qformer_layers)
        ]
        self.language_projection = nn.Dense(c.decoder_width, dtype=self.compute_dtype)
        self.embed_tokens = self.param(
            "embed_tokens", nn.initializers.normal(0.02), (c.vocab_size, c.decoder_width), jnp.float32
        )
        n_pos = (c.max_positions or (c.max_text_len + c.n_queries)) + 2  # OPT offset rows
        self.embed_positions = self.param(
            "embed_positions", nn.initializers.normal(0.02), (n_pos, c.decoder_width), jnp.float32
        )
        self.blocks = [
            OptBlock(c.decoder_heads, c.decoder_mlp_dim or 4 * c.decoder_width,
                     lora_rank=c.lora_rank, dtype=self.compute_dtype, name=f"opt_block_{i}")
            for i in range(c.decoder_layers)
        ]
        self.ln_final = FpLayerNorm()

    def encode_image_prefix(self, pixels):
        img = self.visual_tower(pixels).astype(self.compute_dtype)
        img = jax.lax.stop_gradient(img)  # BLIP-2 freezes its image encoder
        c: Blip2Config = self.cfg
        x = jnp.broadcast_to(
            self.query_tokens[None].astype(self.compute_dtype),
            (pixels.shape[0],) + self.query_tokens.shape,
        )
        x = self.qformer_input_ln(x)
        for block in self.qformer_blocks:
            x = block(x, img)
        return self.language_projection(x)

    def _decode(self, image_tokens, text_tokens, key_mask=None):
        """OPT decoder over [projected queries, text embeds]; causal over the
        whole sequence (HF builds one causal mask for the concat), learned
        positions with the OPT +2 offset; logits tied to embed_tokens.

        ``key_mask`` (B, L_txt) bool marks VALID text positions for
        left-padded prompts (the judge-serving path): padded keys are
        masked out of attention and skip position ids exactly like HF's
        cumsum-over-attention-mask OPT positions. None keeps the static
        contiguous-positions parity path."""
        n_img = image_tokens.shape[1]
        l_txt = text_tokens.shape[1]
        txt = jnp.take(self.embed_tokens, text_tokens, axis=0).astype(self.compute_dtype)
        x = jnp.concatenate([image_tokens, txt], axis=1)
        total = n_img + l_txt
        pos = jnp.arange(total)
        causal = jnp.where(pos[None, :] <= pos[:, None], 0.0, -jnp.inf)[None, None, :, :]
        if key_mask is None:
            x = x + self.embed_positions[2 : total + 2].astype(x.dtype)
            mask = causal
        else:
            full_mask = jnp.concatenate(
                [jnp.ones((key_mask.shape[0], n_img), key_mask.dtype), key_mask], axis=1
            )
            # OPTLearnedPositionalEmbedding: cumsum(mask)*mask - 1, + offset 2
            pos_ids = (jnp.cumsum(full_mask.astype(jnp.int32), axis=1) * full_mask - 1) * full_mask + 2
            x = x + jnp.take(self.embed_positions, pos_ids, axis=0).astype(x.dtype)
            mask = causal + jnp.where(full_mask, 0.0, -jnp.inf)[:, None, None, :]
        for block in self.blocks:
            x = block(x, mask)
        x = self.ln_final(x)
        logits = jnp.einsum("bld,vd->blv", x.astype(self.compute_dtype),
                            self.embed_tokens.astype(self.compute_dtype))
        return logits[:, n_img:, :]

    def generate_judged(self, pixels, prompt_tokens, prompt_mask, max_new_tokens: int = 16):
        """Prompt-conditioned greedy generation for the judge backends:
        LEFT-padded prompts (every row's last prompt token abuts its first
        generated position), returns (generated tokens (B, T), per-step
        log P(chosen token) (B, T)) — the HF backend's
        compute_transition_scores semantics (cli/run_judges.py)."""
        c: Blip2Config = self.cfg
        prefix = self.encode_image_prefix(pixels)
        b, lp = prompt_tokens.shape
        text = jnp.concatenate(
            [prompt_tokens, jnp.full((b, max_new_tokens), c.pad_token_id, jnp.int32)], axis=1
        )
        key_mask = jnp.concatenate(
            [prompt_mask.astype(jnp.int32), jnp.zeros((b, max_new_tokens), jnp.int32)], axis=1
        )
        logprobs = jnp.zeros((b, max_new_tokens), jnp.float32)

        def step(carry, t):
            text, key_mask, logprobs, done = carry
            logits = self._decode(prefix, text, key_mask=key_mask)
            step_logits = logits[:, lp + t - 1, :].astype(jnp.float32)
            lp_all = jax.nn.log_softmax(step_logits, axis=-1)
            nxt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
            chosen = jnp.take_along_axis(lp_all, nxt[:, None], axis=1)[:, 0]
            nxt = jnp.where(done, c.pad_token_id, nxt)
            chosen = jnp.where(done, 0.0, chosen)
            text = jax.lax.dynamic_update_slice_in_dim(text.T, nxt[None, :], lp + t, 0).T
            key_mask = jax.lax.dynamic_update_slice_in_dim(
                key_mask.T, jnp.where(done, 0, 1)[None, :].astype(jnp.int32), lp + t, 0
            ).T
            logprobs = jax.lax.dynamic_update_slice_in_dim(logprobs.T, chosen[None, :], t, 0).T
            done = done | (nxt == c.eos_token_id)
            return (text, key_mask, logprobs, done), ()

        (text, _, logprobs, _), _ = jax.lax.scan(
            step, (text, key_mask, logprobs, jnp.zeros(b, bool)), jnp.arange(max_new_tokens)
        )
        return text[:, lp:], logprobs


# ---------------------------------------------------------------------------
# HF checkpoint conversion


def _t(w):
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def blip2_config_from_hf(hf_cfg, lora_rank: int = 0, max_text_len: int = 40) -> Blip2Config:
    v, q, t = hf_cfg.vision_config, hf_cfg.qformer_config, hf_cfg.text_config
    assert t.model_type == "opt", f"only the OPT LM variant is modeled (reference default blip2-opt-2.7b), got {t.model_type}"
    assert getattr(t, "word_embed_proj_dim", t.hidden_size) == t.hidden_size, "OPT project_in/out not modeled"
    assert getattr(t, "do_layer_norm_before", True), "post-LN OPT (do_layer_norm_before=False) not modeled"
    return Blip2Config(
        vision=ClipConfig(
            image_resolution=v.image_size, vision_width=v.hidden_size,
            vision_layers=v.num_hidden_layers, vision_heads=v.num_attention_heads,
            vision_patch_size=v.patch_size,
        ),
        vision_mlp_dim=v.intermediate_size,
        n_queries=hf_cfg.num_query_tokens,
        qformer_width=q.hidden_size, qformer_layers=q.num_hidden_layers,
        qformer_heads=q.num_attention_heads, qformer_mlp_dim=q.intermediate_size,
        cross_attention_freq=q.cross_attention_frequency,
        vocab_size=t.vocab_size, decoder_width=t.hidden_size,
        decoder_layers=t.num_hidden_layers, decoder_heads=t.num_attention_heads,
        decoder_mlp_dim=t.ffn_dim, max_positions=t.max_position_embeddings,
        max_text_len=max_text_len, lora_rank=lora_rank,
        pad_token_id=t.pad_token_id, bos_token_id=t.bos_token_id, eos_token_id=t.eos_token_id,
    )


def convert_blip2_state_dict(sd, cfg: Blip2Config) -> dict:
    """HF ``Blip2ForConditionalGeneration`` state dict → Blip2Captioner
    params (LoRA factors, if any, are NOT populated — callers merge them
    from the init tree so adapters start at the standard zero-product)."""
    p: dict = {}

    def dense(prefix_hf, transpose=True):
        out = {"kernel": _t(sd[f"{prefix_hf}.weight"]) if transpose else np.asarray(sd[f"{prefix_hf}.weight"], np.float32)}
        if f"{prefix_hf}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{prefix_hf}.bias"], np.float32)
        return out

    def ln(prefix_hf):
        return {"scale": np.asarray(sd[f"{prefix_hf}.weight"], np.float32),
                "bias": np.asarray(sd[f"{prefix_hf}.bias"], np.float32)}

    vis = {
        "patch_embedding": {
            # torch conv (O, I, kh, kw) → flax (kh, kw, I, O)
            "kernel": np.ascontiguousarray(np.asarray(
                sd["vision_model.embeddings.patch_embedding.weight"], np.float32).transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd["vision_model.embeddings.patch_embedding.bias"], np.float32),
        },
        "class_embedding": np.asarray(sd["vision_model.embeddings.class_embedding"], np.float32).reshape(-1),
        "position_embedding": np.asarray(sd["vision_model.embeddings.position_embedding"], np.float32)[0],
        "post_layernorm": ln("vision_model.post_layernorm"),
    }
    for i in range(int(cfg.vision.vision_layers)):
        hf = f"vision_model.encoder.layers.{i}"
        vis[f"block_{i}"] = {
            "layer_norm1": ln(f"{hf}.layer_norm1"),
            "qkv": dense(f"{hf}.self_attn.qkv"),
            "projection": dense(f"{hf}.self_attn.projection"),
            "layer_norm2": ln(f"{hf}.layer_norm2"),
            "fc1": dense(f"{hf}.mlp.fc1"),
            "fc2": dense(f"{hf}.mlp.fc2"),
        }
    p["visual"] = vis

    p["query_tokens"] = np.asarray(sd["query_tokens"], np.float32)[0]
    p["qformer_input_ln"] = ln("qformer.layernorm")
    for i in range(cfg.qformer_layers):
        hf = f"qformer.encoder.layer.{i}"
        blk = {
            "self_query": dense(f"{hf}.attention.attention.query"),
            "self_key": dense(f"{hf}.attention.attention.key"),
            "self_value": dense(f"{hf}.attention.attention.value"),
            "self_out": dense(f"{hf}.attention.output.dense"),
            "ln_self": ln(f"{hf}.attention.output.LayerNorm"),
            "intermediate_query": dense(f"{hf}.intermediate_query.dense"),
            "output_query": dense(f"{hf}.output_query.dense"),
            "ln_output": ln(f"{hf}.output_query.LayerNorm"),
        }
        if i % cfg.cross_attention_freq == 0:
            blk.update({
                "cross_query": dense(f"{hf}.crossattention.attention.query"),
                "cross_key": dense(f"{hf}.crossattention.attention.key"),
                "cross_value": dense(f"{hf}.crossattention.attention.value"),
                "cross_out": dense(f"{hf}.crossattention.output.dense"),
                "ln_cross": ln(f"{hf}.crossattention.output.LayerNorm"),
            })
        p[f"qformer_block_{i}"] = blk
    p["language_projection"] = dense("language_projection")

    dec = "language_model.model.decoder"
    p["embed_tokens"] = np.asarray(sd[f"{dec}.embed_tokens.weight"], np.float32)
    p["embed_positions"] = np.asarray(sd[f"{dec}.embed_positions.weight"], np.float32)
    p["ln_final"] = ln(f"{dec}.final_layer_norm")
    for i in range(cfg.decoder_layers):
        hf = f"{dec}.layers.{i}"
        p[f"opt_block_{i}"] = {
            "self_attn_layer_norm": ln(f"{hf}.self_attn_layer_norm"),
            "q_proj": dense(f"{hf}.self_attn.q_proj"),
            "k_proj": dense(f"{hf}.self_attn.k_proj"),
            "v_proj": dense(f"{hf}.self_attn.v_proj"),
            "out_proj": dense(f"{hf}.self_attn.out_proj"),
            "final_layer_norm": ln(f"{hf}.final_layer_norm"),
            "fc1": dense(f"{hf}.fc1"),
            "fc2": dense(f"{hf}.fc2"),
        }
    return p


def load_blip2(checkpoint_dir: str | Path, lora_rank: int = 0, max_text_len: int = 40, seed: int = 0):
    """Load a local HF BLIP-2 (OPT) checkpoint dir → (model, params, cfg).

    The converted tree is validated leaf-by-leaf against a jitted init
    (every non-LoRA leaf must exist with the right shape); LoRA factors
    keep their init values (B=0 ⇒ the adapters start as identity).
    """
    import torch
    from transformers import Blip2Config as HfBlip2Config

    checkpoint_dir = str(checkpoint_dir)
    hf_cfg = HfBlip2Config.from_pretrained(checkpoint_dir)
    cfg = blip2_config_from_hf(hf_cfg, lora_rank=lora_rank, max_text_len=max_text_len)

    from transformers import Blip2ForConditionalGeneration

    with torch.no_grad():
        hf_model = Blip2ForConditionalGeneration.from_pretrained(checkpoint_dir)
        sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    del hf_model
    converted = convert_blip2_state_dict(sd, cfg)

    from lemon_tpu.models.captioner import init_captioner

    model, init_params = init_captioner(cfg, seed)
    params = jax.tree_util.tree_map(lambda x: x, init_params)  # copy structure

    def merge(init_tree, conv_tree, path=""):
        out = {}
        for key, val in init_tree.items():
            if isinstance(val, dict):
                out[key] = merge(val, conv_tree.get(key, {}), f"{path}/{key}")
            elif key in ("lora_a", "lora_b"):
                out[key] = val  # adapters start at init (B=0 → identity)
            else:
                assert key in conv_tree, f"converter missing {path}/{key}"
                got = np.asarray(conv_tree[key])
                assert got.shape == val.shape, (f"{path}/{key}", got.shape, val.shape)
                out[key] = jnp.asarray(got)
        for key in conv_tree:
            assert key in init_tree, f"converter produced unknown key {path}/{key}"
        return out

    params = {"params": merge(init_params["params"], converted)}
    return model, params, cfg
