"""BiomedCLIP: timm-style ViT-B/16 vision trunk + PubMedBERT text tower.

Counterpart of the reference's 'biomed_clip' option (lib/models/utils.py:
72-79, open_clip BiomedCLIP-PubMedBERT_256-vit_base_patch16_224):

- vision: ViT-B/16 at 224 with timm conventions (patch-embed bias, no
  pre-LN) + a linear head to the shared 512-d space
- text: BERT-base encoder, CLS pooling, MLP projection (open_clip
  HFTextEncoder head), context length 256
- tokenizer: WordPiece — requires a local PubMedBERT vocab
  (``LEMON_TPU_BIOMED_VOCAB`` pointing at vocab.txt); tokenization is
  pluggable on the encoder, so any callable producing (B, 256) int32 works.

Checkpoint conversion consumes open_clip state dicts
(visual.trunk.* timm keys, visual.head.proj, text.transformer.* HF-BERT
keys, text.proj.*).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lemon_tpu.models.bert_text import BertTextConfig, BertTextTower, bert_params_from_hf
from lemon_tpu.models.clip import ClipConfig, VisionTower
from lemon_tpu.models.loader import _conv_to_patch_kernel


def biomed_vision_config() -> ClipConfig:
    return ClipConfig(
        embed_dim=512,
        vision_patch_size=16,
        vision_width=768,
        vision_layers=12,
        quick_gelu=False,  # timm ViT uses exact GELU
        vision_patch_bias=True,
        vision_ln_pre=False,
    )


@dataclasses.dataclass(frozen=True)
class BiomedClipConfig:
    vision: ClipConfig = dataclasses.field(default_factory=biomed_vision_config)
    text: BertTextConfig = dataclasses.field(default_factory=BertTextConfig.pubmedbert)

    @staticmethod
    def tiny() -> "BiomedClipConfig":
        return BiomedClipConfig(
            vision=dataclasses.replace(
                ClipConfig.tiny(), quick_gelu=False, vision_patch_bias=True, vision_ln_pre=False,
                embed_dim=16,
            ),
            text=BertTextConfig.tiny(),
        )

    @property
    def embed_dim(self) -> int:
        return self.text.embed_dim

    @property
    def image_resolution(self) -> int:
        return self.vision.image_resolution

    @property
    def context_length(self) -> int:
        return self.text.context_length


class BiomedClipModel(nn.Module):
    cfg: BiomedClipConfig

    def setup(self):
        self.visual = VisionTower(self.cfg.vision)
        self.text = BertTextTower(self.cfg.text)
        self.logit_scale = self.param(
            "logit_scale", lambda key, shape: jnp.full(shape, np.log(1 / 0.07), jnp.float32), ()
        )

    def encode_image(self, pixels):
        return self.visual(pixels)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, pixels, tokens):
        img = self.encode_image(pixels)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        logits = jnp.exp(self.logit_scale) * img @ txt.T
        return logits, logits.T


def init_biomed(cfg: BiomedClipConfig, seed: int = 0):
    model = BiomedClipModel(cfg)
    pixels = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32)
    tokens = jnp.zeros((1, cfg.context_length), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), pixels, tokens)
    return model, params


def from_open_clip_state_dict(sd: Mapping[str, np.ndarray], cfg: BiomedClipConfig | None = None):
    """Convert an open_clip BiomedCLIP state dict to BiomedClipModel params."""
    cfg = cfg or BiomedClipConfig()
    g = lambda name: np.asarray(sd[name])

    blocks = {}
    for i in range(cfg.vision.vision_layers):
        bp = f"visual.trunk.blocks.{i}."
        qkv_w = g(bp + "attn.qkv.weight")  # (3d, d) rows [q; k; v]
        qkv_b = g(bp + "attn.qkv.bias")
        blocks[f"block_{i}"] = {
            "ln_1": {"scale": g(bp + "norm1.weight"), "bias": g(bp + "norm1.bias")},
            "ln_2": {"scale": g(bp + "norm2.weight"), "bias": g(bp + "norm2.bias")},
            "attn": {
                "qkv": {"kernel": qkv_w.T, "bias": qkv_b},
                "out": {"kernel": g(bp + "attn.proj.weight").T, "bias": g(bp + "attn.proj.bias")},
            },
            "mlp_fc": {"kernel": g(bp + "mlp.fc1.weight").T, "bias": g(bp + "mlp.fc1.bias")},
            "mlp_proj": {"kernel": g(bp + "mlp.fc2.weight").T, "bias": g(bp + "mlp.fc2.bias")},
        }
    visual = {
        "patch_embedding": _conv_to_patch_kernel(g("visual.trunk.patch_embed.proj.weight")),
        "patch_bias": g("visual.trunk.patch_embed.proj.bias"),
        "class_embedding": g("visual.trunk.cls_token").reshape(-1),
        "positional_embedding": g("visual.trunk.pos_embed").reshape(-1, cfg.vision.vision_width),
        "transformer": blocks,
        "ln_post": {"scale": g("visual.trunk.norm.weight"), "bias": g("visual.trunk.norm.bias")},
        "proj": g("visual.head.proj.weight").T,
    }
    text = bert_params_from_hf(sd, cfg.text)["params"]
    params = {"visual": visual, "text": text, "logit_scale": g("logit_scale")}
    return {"params": params}, cfg


def wordpiece_tokenize_fn(vocab_path: str, context_length: int = 256):
    """WordPiece tokenizer from a local BERT vocab.txt (no network)."""
    from transformers import BertTokenizerFast

    tok = BertTokenizerFast(vocab_file=vocab_path)

    def tokenize(texts):
        out = tok(list(texts), padding="max_length", truncation=True, max_length=context_length)
        return np.asarray(out["input_ids"], np.int32)

    return tokenize
