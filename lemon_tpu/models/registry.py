"""Model factory mirroring the reference's registry names
(lib/models/utils.py:64-105 / run_lemon.py:43):

- 'huggingface_clip'            ViT-B/32, weights from an HF CLIPModel
                                checkpoint when available
- 'chexzero'                    ViT-B/32, OpenAI-format fine-tuned state dict
- 'mimic_clip_from_scratch_*'   ViT-B/16 embed 768, context 256
- 'cc3m_clip_from_scratch'      ViT-B/16 embed 768, context 77
- 'biomed_clip'                 BiomedCLIP: timm ViT-B/16 trunk +
                                PubMedBERT text tower (models/biomed.py)
- 'tiny'                        test-scale config (framework-only)

Checkpoint resolution: ``LEMON_TPU_CKPT_<NAME>`` env var, then
``<data_root>/checkpoints/<name>.{pt,npz}``; without a checkpoint the model
initializes randomly (flagged loudly — fine for benchmarks and synthetic
tests, wrong for real-dataset parity).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

from lemon_tpu.core.precision import Precision, default_precision
from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params
from lemon_tpu.models.encoder import ClipEncoder
from lemon_tpu.models.loader import detect_and_convert, load_torch_file

MODEL_CONFIGS = {
    "huggingface_clip": ClipConfig.vit_b32(),
    "chexzero": ClipConfig.vit_b32(),
    "mimic_clip_from_scratch_random": ClipConfig.from_scratch_mimic(),
    "mimic_clip_from_scratch_cat": ClipConfig.from_scratch_mimic(),
    "cc3m_clip_from_scratch": ClipConfig.vit_b16(embed_dim=768, context_length=77),
    "rn50": ClipConfig.rn50(),  # ModifiedResNet tower (chexzero_clip.py:120-174)
    "tiny": ClipConfig.tiny(),
}


def _checkpoint_path(name: str) -> Optional[Path]:
    env = os.environ.get(f"LEMON_TPU_CKPT_{name.upper()}")
    if env:
        return Path(env)
    from lemon_tpu.data.datasets import data_root

    for suffix in (".npz", ".pt", ".bin", ".safetensors"):
        cand = data_root() / "checkpoints" / f"{name}{suffix}"
        if cand.exists():
            return cand
    return None


def checkpoint_fingerprint(ckpt: Optional[Path], seed: int) -> str:
    """Weights identity for cache keys: random inits are keyed on the seed,
    checkpoints on resolved path + mtime + size (cheap content proxy)."""
    if ckpt is None:
        return f"random:{seed}"
    st = ckpt.stat()
    return f"{ckpt.resolve()}:{st.st_mtime_ns}:{st.st_size}"


def _load_params(path: Path, cfg: ClipConfig):
    if path.suffix == ".npz":
        import numpy as np

        blob = np.load(path)
        flat = {k: blob[k] for k in blob.files}
        return _unflatten(flat), cfg
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        sd = load_torch_file(path)
    sd = {k: v for k, v in sd.items() if "position_ids" not in k}
    return detect_and_convert(sd)


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def create_encoder(
    name: str,
    seed: int = 0,
    batch_size: int = 128,
    mesh=None,
    precision: Optional[Precision] = None,
    checkpoint: Optional[str] = None,
) -> ClipEncoder:
    """Build a frozen encoder for a registry name (the analog of
    algorithm_class_from_scratch + .eval(), run_lemon.py:112-115)."""
    if name == "biomed_clip":
        return _create_biomed_encoder(seed=seed, batch_size=batch_size, mesh=mesh, checkpoint=checkpoint)
    if name not in MODEL_CONFIGS:
        raise KeyError(f"unknown clip_model '{name}'; options: {sorted(MODEL_CONFIGS)}")

    cfg = MODEL_CONFIGS[name]
    precision = precision or default_precision()

    ckpt = Path(checkpoint) if checkpoint else _checkpoint_path(name)
    if ckpt is not None:
        params, loaded_cfg = _load_params(ckpt, cfg)
        cfg = loaded_cfg or cfg
        model = ClipModel(cfg, precision=precision)
        print(f"[lemon_tpu] loaded {name} weights from {ckpt}")
    else:
        model, params = init_params(cfg, seed=seed, precision=precision)
        print(
            f"[lemon_tpu] WARNING: no checkpoint for '{name}' "
            f"(set LEMON_TPU_CKPT_{name.upper()}); using random init"
        )
    return ClipEncoder(
        model, params, batch_size=batch_size, mesh=mesh,
        weights_fingerprint=checkpoint_fingerprint(ckpt, seed),
    )


def _create_biomed_encoder(seed: int = 0, batch_size: int = 128, mesh=None, checkpoint: Optional[str] = None) -> ClipEncoder:
    """BiomedCLIP encoder: timm ViT-B/16 + PubMedBERT (models/biomed.py).

    Weights from an open_clip checkpoint (LEMON_TPU_CKPT_BIOMED_CLIP or
    --checkpoint); WordPiece vocab from LEMON_TPU_BIOMED_VOCAB. Without a
    vocab the CLIP BPE tokenizer stands in (ids clipped to the BERT vocab)
    so random-init benchmarking still works.
    """
    from lemon_tpu.models.biomed import (
        BiomedClipConfig,
        from_open_clip_state_dict,
        init_biomed,
        wordpiece_tokenize_fn,
    )

    cfg = BiomedClipConfig()
    ckpt = Path(checkpoint) if checkpoint else _checkpoint_path("biomed_clip")
    if ckpt is not None:
        sd = load_torch_file(ckpt)
        params, cfg = from_open_clip_state_dict(sd, cfg)
        model = __import__("lemon_tpu.models.biomed", fromlist=["BiomedClipModel"]).BiomedClipModel(cfg)
        print(f"[lemon_tpu] loaded biomed_clip weights from {ckpt}")
    else:
        model, params = init_biomed(cfg, seed=seed)
        print("[lemon_tpu] WARNING: no checkpoint for 'biomed_clip'; using random init")

    vocab = os.environ.get("LEMON_TPU_BIOMED_VOCAB")
    if vocab and Path(vocab).exists():
        tokenize_fn = wordpiece_tokenize_fn(vocab, cfg.context_length)
    else:
        import numpy as _np

        from lemon_tpu.models.tokenizer import tokenize_batch as _tb

        def tokenize_fn(texts):
            toks = _tb(list(texts), cfg.context_length)
            return (_np.asarray(toks) % cfg.text.vocab_size).astype(_np.int32)

        print("[lemon_tpu] WARNING: no PubMedBERT vocab (LEMON_TPU_BIOMED_VOCAB); using clipped CLIP-BPE ids")
    return ClipEncoder(
        model, params, batch_size=batch_size, mesh=mesh, tokenize_fn=tokenize_fn,
        weights_fingerprint=checkpoint_fingerprint(ckpt, seed),
    )
