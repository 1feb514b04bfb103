"""Checkpoint conversion: HuggingFace / OpenAI CLIP state dicts -> Flax params.

Covers both checkpoint families the reference consumes:

- HuggingFace ``CLIPModel`` (``openai/clip-vit-base-patch32``; run_lemon.py:112-115)
- OpenAI-format state dicts as produced by the from-scratch trainer and
  chexzero (chexzero_clip.py:419-479): fused ``attn.in_proj_weight`` etc.

All tensors arrive as numpy arrays (use :func:`load_torch_file` for ``.pt``
files); conversion is pure reshapes/transposes into the parameter pytree of
:class:`lemon_tpu.models.clip.ClipModel`.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from lemon_tpu.models.clip import ClipConfig


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pt``/``.bin`` checkpoint into numpy (host-side only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in obj.items()}


def _conv_to_patch_kernel(w: np.ndarray) -> np.ndarray:
    """(width, 3, P, P) conv kernel -> (P*P*3, width) patch matmul kernel.

    The vision tower unfolds each patch with element order (ph, pw, channel),
    so the kernel is transposed to (ph, pw, channel, width) before flattening.
    """
    return np.transpose(w, (2, 3, 1, 0)).reshape(-1, w.shape[0])


def _block_params(q_w, q_b, k_w, k_b, v_w, v_b, out_w, out_b, ln1_w, ln1_b, ln2_w, ln2_b, fc_w, fc_b, proj_w, proj_b):
    """Assemble one transformer block. All torch Linear weights are (out, in)."""
    qkv_kernel = np.concatenate([q_w.T, k_w.T, v_w.T], axis=1)
    qkv_bias = np.concatenate([q_b, k_b, v_b])
    return {
        "ln_1": {"scale": ln1_w, "bias": ln1_b},
        "ln_2": {"scale": ln2_w, "bias": ln2_b},
        "attn": {
            "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
            "out": {"kernel": out_w.T, "bias": out_b},
        },
        "mlp_fc": {"kernel": fc_w.T, "bias": fc_b},
        "mlp_proj": {"kernel": proj_w.T, "bias": proj_b},
    }


def hf_config_from_state_dict(sd: Mapping[str, np.ndarray]) -> ClipConfig:
    vision_width = sd["vision_model.embeddings.class_embedding"].shape[0]
    patch = sd["vision_model.embeddings.patch_embedding.weight"].shape[-1]
    n_pos = sd["vision_model.embeddings.position_embedding.weight"].shape[0]
    grid = int(round((n_pos - 1) ** 0.5))
    vision_layers = len({k.split(".")[3] for k in sd if k.startswith("vision_model.encoder.layers.")})
    text_layers = len({k.split(".")[3] for k in sd if k.startswith("text_model.encoder.layers.")})
    text_width = sd["text_model.final_layer_norm.weight"].shape[0]
    return ClipConfig(
        embed_dim=sd["text_projection.weight"].shape[0],
        image_resolution=patch * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=sd["text_model.embeddings.position_embedding.weight"].shape[0],
        vocab_size=sd["text_model.embeddings.token_embedding.weight"].shape[0],
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=text_layers,
    )


def from_hf_state_dict(sd: Mapping[str, np.ndarray], cfg: ClipConfig | None = None):
    """Convert a transformers ``CLIPModel`` state dict to Flax params."""
    cfg = cfg or hf_config_from_state_dict(sd)

    def block(prefix: str) -> dict:
        g = lambda name: np.asarray(sd[f"{prefix}.{name}"])
        return _block_params(
            g("self_attn.q_proj.weight"), g("self_attn.q_proj.bias"),
            g("self_attn.k_proj.weight"), g("self_attn.k_proj.bias"),
            g("self_attn.v_proj.weight"), g("self_attn.v_proj.bias"),
            g("self_attn.out_proj.weight"), g("self_attn.out_proj.bias"),
            g("layer_norm1.weight"), g("layer_norm1.bias"),
            g("layer_norm2.weight"), g("layer_norm2.bias"),
            g("mlp.fc1.weight"), g("mlp.fc1.bias"),
            g("mlp.fc2.weight"), g("mlp.fc2.bias"),
        )

    params = {
        "visual": {
            "patch_embedding": _conv_to_patch_kernel(np.asarray(sd["vision_model.embeddings.patch_embedding.weight"])),
            "class_embedding": np.asarray(sd["vision_model.embeddings.class_embedding"]),
            "positional_embedding": np.asarray(sd["vision_model.embeddings.position_embedding.weight"]),
            "ln_pre": {
                "scale": np.asarray(sd["vision_model.pre_layrnorm.weight"]),
                "bias": np.asarray(sd["vision_model.pre_layrnorm.bias"]),
            },
            "transformer": {
                f"block_{i}": block(f"vision_model.encoder.layers.{i}") for i in range(cfg.vision_layers)
            },
            "ln_post": {
                "scale": np.asarray(sd["vision_model.post_layernorm.weight"]),
                "bias": np.asarray(sd["vision_model.post_layernorm.bias"]),
            },
            "proj": np.asarray(sd["visual_projection.weight"]).T,
        },
        "text": {
            "token_embedding": np.asarray(sd["text_model.embeddings.token_embedding.weight"]),
            "positional_embedding": np.asarray(sd["text_model.embeddings.position_embedding.weight"]),
            "transformer": {
                f"block_{i}": block(f"text_model.encoder.layers.{i}") for i in range(cfg.text_layers)
            },
            "ln_final": {
                "scale": np.asarray(sd["text_model.final_layer_norm.weight"]),
                "bias": np.asarray(sd["text_model.final_layer_norm.bias"]),
            },
            "text_projection": np.asarray(sd["text_projection.weight"]).T,
        },
        "logit_scale": np.asarray(sd["logit_scale"]),
    }
    return {"params": params}, cfg


def _text_config_fields(sd: Mapping[str, np.ndarray]) -> dict:
    text_width = sd["ln_final.weight"].shape[0]
    return dict(
        embed_dim=sd["text_projection"].shape[1],
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}),
    )


def rn_config_from_state_dict(sd: Mapping[str, np.ndarray]) -> ClipConfig:
    """Shape-inference for ModifiedResNet checkpoints, mirroring the RN
    branch of build_model (chexzero_clip.py:429-436)."""
    counts = tuple(
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")}) for b in (1, 2, 3, 4)
    )
    vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
    output_width = int(round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
    assert output_width ** 2 + 1 == sd["visual.attnpool.positional_embedding"].shape[0]
    return ClipConfig(
        image_resolution=output_width * 32,
        vision_layers=counts,
        vision_width=vision_width,
        **_text_config_fields(sd),
    )


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch (out, in, kh, kw) -> flax NHWC conv kernel (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def _bn_params(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def _rn_visual_params(sd: Mapping[str, np.ndarray], cfg: ClipConfig) -> dict:
    """visual.* of an RN state dict -> ResNetVisionTower params."""
    g = lambda name: np.asarray(sd[f"visual.{name}"])
    visual = {}
    for i in (1, 2, 3):
        visual[f"stem_conv{i}"] = {"kernel": _conv_kernel(g(f"conv{i}.weight"))}
        visual[f"stem_bn{i}"] = _bn_params(sd, f"visual.bn{i}")
    for stage, n_blocks in enumerate(cfg.vision_layers, start=1):
        for j in range(n_blocks):
            p = f"visual.layer{stage}.{j}"
            blk = {
                "conv1": {"kernel": _conv_kernel(np.asarray(sd[f"{p}.conv1.weight"]))},
                "bn1": _bn_params(sd, f"{p}.bn1"),
                "conv2": {"kernel": _conv_kernel(np.asarray(sd[f"{p}.conv2.weight"]))},
                "bn2": _bn_params(sd, f"{p}.bn2"),
                "conv3": {"kernel": _conv_kernel(np.asarray(sd[f"{p}.conv3.weight"]))},
                "bn3": _bn_params(sd, f"{p}.bn3"),
            }
            # downsample Sequential: "-1" avgpool (no params), "0" conv, "1" bn
            if f"{p}.downsample.0.weight" in sd:
                blk["down_conv"] = {"kernel": _conv_kernel(np.asarray(sd[f"{p}.downsample.0.weight"]))}
                blk["down_bn"] = _bn_params(sd, f"{p}.downsample.1")
            visual[f"layer{stage}_{j}"] = blk
    visual["attnpool"] = {
        "positional_embedding": g("attnpool.positional_embedding"),
        **{
            proj: {
                "kernel": g(f"attnpool.{proj}.weight").T,
                "bias": g(f"attnpool.{proj}.bias"),
            }
            for proj in ("q_proj", "k_proj", "v_proj", "c_proj")
        },
    }
    return visual


def openai_config_from_state_dict(sd: Mapping[str, np.ndarray]) -> ClipConfig:
    """Shape-inference mirroring chexzero_clip.py:419-456 (ViT variants)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vision_layers = len({k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")})
    return ClipConfig(
        image_resolution=patch * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        **_text_config_fields(sd),
    )


def from_openai_state_dict(sd: Mapping[str, np.ndarray], cfg: ClipConfig | None = None):
    """Convert an OpenAI-format CLIP state dict (fused in_proj) to Flax
    params. Detects the visual tower like build_model (chexzero_clip.py:420):
    ``visual.proj`` present = ViT, else ModifiedResNet."""
    is_vit = "visual.proj" in sd
    if cfg is None:
        cfg = openai_config_from_state_dict(sd) if is_vit else rn_config_from_state_dict(sd)

    def block(prefix: str) -> dict:
        g = lambda name: np.asarray(sd[f"{prefix}.{name}"])
        in_w = g("attn.in_proj_weight")  # (3d, d) rows stacked [q; k; v]
        in_b = g("attn.in_proj_bias")
        d = in_w.shape[1]
        q_w, k_w, v_w = in_w[:d], in_w[d : 2 * d], in_w[2 * d :]
        q_b, k_b, v_b = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]
        return _block_params(
            q_w, q_b, k_w, k_b, v_w, v_b,
            g("attn.out_proj.weight"), g("attn.out_proj.bias"),
            g("ln_1.weight"), g("ln_1.bias"),
            g("ln_2.weight"), g("ln_2.bias"),
            g("mlp.c_fc.weight"), g("mlp.c_fc.bias"),
            g("mlp.c_proj.weight"), g("mlp.c_proj.bias"),
        )

    if is_vit:
        visual = {
            "patch_embedding": _conv_to_patch_kernel(np.asarray(sd["visual.conv1.weight"])),
            "class_embedding": np.asarray(sd["visual.class_embedding"]),
            "positional_embedding": np.asarray(sd["visual.positional_embedding"]),
            "ln_pre": {"scale": np.asarray(sd["visual.ln_pre.weight"]), "bias": np.asarray(sd["visual.ln_pre.bias"])},
            "transformer": {
                f"block_{i}": block(f"visual.transformer.resblocks.{i}") for i in range(cfg.vision_layers)
            },
            "ln_post": {"scale": np.asarray(sd["visual.ln_post.weight"]), "bias": np.asarray(sd["visual.ln_post.bias"])},
            "proj": np.asarray(sd["visual.proj"]),
        }
    else:
        visual = _rn_visual_params(sd, cfg)
    params = {
        "visual": visual,
        "text": {
            "token_embedding": np.asarray(sd["token_embedding.weight"]),
            "positional_embedding": np.asarray(sd["positional_embedding"]),
            "transformer": {
                f"block_{i}": block(f"transformer.resblocks.{i}") for i in range(cfg.text_layers)
            },
            "ln_final": {"scale": np.asarray(sd["ln_final.weight"]), "bias": np.asarray(sd["ln_final.bias"])},
            "text_projection": np.asarray(sd["text_projection"]),
        },
        "logit_scale": np.asarray(sd["logit_scale"]),
    }
    return {"params": params}, cfg


def detect_and_convert(sd: Mapping[str, np.ndarray]):
    if any(k.startswith("vision_model.") for k in sd):
        return from_hf_state_dict(sd)
    if any(k.startswith("visual.") for k in sd):
        return from_openai_state_dict(sd)
    raise ValueError("Unrecognized CLIP state-dict format")
