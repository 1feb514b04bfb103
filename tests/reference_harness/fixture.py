"""Shared fixtures for the live-reference parity harness: a tiny (but
architecturally real) HF CLIP checkpoint both pipelines load, and
synthetic datasets written in the REFERENCE's on-disk formats so the
reference code runs unmodified:

- captioning: an mscoco-layout dir (``multimodal_mislabel_split.pkl`` +
  image files; lib/datasets/utils.py:275-323 contract)
- classification: standard CIFAR-10 python pickles
  (torchvision.datasets.CIFAR10 layout)

Images are class-structured (shared base pattern + per-sample noise) so
kNN over even a random-weight CLIP carries real mislabel signal: image
neighbors are same-class, their captions mostly match a clean caption's
class, so d_n/d_m separate flipped pairs and both pipelines should land
well above 0.5 AUROC — making the parity comparison meaningful, not a
comparison of noise.
"""

from __future__ import annotations

import gzip
import json
import pickle
from pathlib import Path

import numpy as np

CLASS_WORDS = [
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
]


def build_checkpoint(out_dir: Path, seed: int = 0) -> dict:
    """Tiny random HF CLIPModel + real CLIP BPE tokenizer.

    Returns paths: ``hf_dir`` (save_pretrained layout, for the reference's
    ``from_pretrained``) and ``state_dict_pt`` (torch state dict, for
    lemon_tpu's loader via LEMON_TPU_CKPT_HUGGINGFACE_CLIP)."""
    import torch
    import transformers

    from lemon_tpu.models.tokenizer import default_vocab_path

    out_dir = Path(out_dir)
    hf_dir = out_dir / "hf_model"
    hf_dir.mkdir(parents=True, exist_ok=True)

    cfg = transformers.CLIPConfig(
        # heads == width // 64: the loaders' shape inference assumes the
        # OpenAI convention (chexzero_clip.py:440-446 analog)
        text_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 1,
            "max_position_embeddings": 77,
            "vocab_size": 49408,
            "hidden_act": "quick_gelu",
            "bos_token_id": 49406,
            "eos_token_id": 49407,
        },
        vision_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 1,
            "image_size": 224,
            "patch_size": 32,
            "hidden_act": "quick_gelu",
        },
        projection_dim=32,
    )
    torch.manual_seed(seed)
    model = transformers.CLIPModel(cfg).eval()
    model.save_pretrained(hf_dir)

    sd_path = out_dir / "huggingface_clip.pt"
    torch.save(model.state_dict(), sd_path)

    # Real CLIP BPE tokenizer from the vendored OpenAI merge table
    # (bit-exact vs lemon_tpu's tokenizer per tests/test_tokenizer.py,
    # whose vocab.json construction this mirrors).
    from lemon_tpu.models.tokenizer import get_tokenizer

    lines = gzip.open(default_vocab_path()).read().decode("utf-8").split("\n")
    merges = lines[1 : 49408 - 512 - 2 + 1]
    with open(hf_dir / "vocab.json", "w") as f:
        json.dump({t: i for i, t in enumerate(get_tokenizer().id_to_token)}, f)
    with open(hf_dir / "merges.txt", "w") as f:
        f.write("#version\n" + "\n".join(merges))
    # model_max_length drives the reference's padding="max_length" /
    # truncation=True tokenize calls (run_lemon.py:151-153); a raw
    # CLIPTokenizer otherwise defaults to VERY_LARGE_INTEGER.
    tok = transformers.CLIPTokenizer(
        str(hf_dir / "vocab.json"), str(hf_dir / "merges.txt"), model_max_length=77
    )
    tok.save_pretrained(hf_dir)

    return {"hf_dir": hf_dir, "state_dict_pt": sd_path}


def _class_images(n: int, size: int, n_classes: int, labels: np.ndarray, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 256, (n_classes, size, size, 3)).astype(np.int16)
    noise = rng.integers(-30, 31, (n, size, size, 3)).astype(np.int16)
    return np.clip(bases[labels] + noise, 0, 255).astype(np.uint8)


def build_caption_fixture(out_dir: Path, n_train: int = 240, n_val: int = 120, n_test: int = 120, seed: int = 7) -> Path:
    """mscoco-layout captioning fixture. Captions are unique per sample
    ('A photo of a {class} scene {id}') so a swap always changes the text."""
    import pandas as pd
    from PIL import Image

    out_dir = Path(out_dir)
    img_dir = out_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    n = n_train + n_val + n_test
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, len(CLASS_WORDS), n)
    images = _class_images(n, 224, len(CLASS_WORDS), labels, seed + 1)
    rows = []
    split = ["train"] * n_train + ["val"] * n_val + ["test"] * n_test
    for i in range(n):
        fname = f"{i:05d}.png"
        Image.fromarray(images[i]).save(img_dir / fname)
        rows.append(
            {
                "split": split[i],
                "filepath": "images",
                "filename": fname,
                "sentence": f"A photo of a {CLASS_WORDS[labels[i]]} scene {i:04d}",
                "nouns_int": [int(labels[i])],
                "cat_labels": [int(labels[i])],
            }
        )
    pd.DataFrame(rows).to_pickle(out_dir / "multimodal_mislabel_split.pkl")
    return out_dir


def build_cifar_fixture(out_dir: Path, n_train: int = 600, seed: int = 11) -> Path:
    """Standard CIFAR-10 pickle layout with synthetic class-structured
    32x32 images (5 train batches + test_batch)."""
    out_dir = Path(out_dir)
    folder = out_dir / "cifar-10-batches-py"
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    def write(path: Path, count: int, label_seed: int):
        labels = rng.integers(0, 10, count)
        imgs = _class_images(count, 32, 10, labels, label_seed)
        data = imgs.transpose(0, 3, 1, 2).reshape(count, -1)
        with open(path, "wb") as f:
            pickle.dump({b"data": data, b"labels": [int(l) for l in labels]}, f)

    per = n_train // 5
    for i in range(1, 6):
        write(folder / f"data_batch_{i}", per, seed + i)
    write(folder / "test_batch", per, seed + 99)
    return out_dir
