"""Aligned mock encoder for baseline tests.

Cross-modal baselines (clip_sim's d1, zero-shot logits) require an encoder
whose image and text embeddings live in a *shared* space — a randomly
initialized CLIP has none, so tests use this mock: both modalities map to a
per-concept codebook vector plus noise. Concepts are recovered from the
synthetic datasets' known structure (caption nouns / class-name prompts /
class templates).
"""

from __future__ import annotations

import numpy as np

from lemon_tpu.data.datasets import load_images
from lemon_tpu.data.labels import CIFAR10_LABELS

CAPTION_NOUNS = [
    "bird", "car", "house", "tree", "dog", "boat", "chair", "flower", "train", "cat", "plane", "horse",
]


def _caption_templates(image_size=32, n_concepts=12):
    yy, xx = np.mgrid[0:image_size, 0:image_size]
    return np.stack(
        [
            np.stack(
                [127 + 120 * np.cos(2 * np.pi * ((c + 2) * xx + (ch + 1) * yy) / image_size / 3) for ch in range(3)],
                -1,
            )
            for c in range(n_concepts)
        ]
    )


def _clf_templates(image_size=32, n_classes=10):
    yy, xx = np.mgrid[0:image_size, 0:image_size]
    return np.stack(
        [
            np.stack(
                [127 + 120 * np.sin(2 * np.pi * ((c + 1) * xx / image_size + (ch + 1) * yy / image_size) / 2) for ch in range(3)],
                -1,
            )
            for c in range(n_classes)
        ]
    )


class AlignedMockEncoder:
    """ClipEncoder-compatible surface with a shared concept codebook."""

    def __init__(self, dim: int = 24, noise: float = 0.15, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.dim = dim
        self.noise = noise
        n_codes = len(CAPTION_NOUNS) + len(CIFAR10_LABELS)
        book = self.rng.standard_normal((n_codes, dim))
        self.codebook = book / np.linalg.norm(book, axis=1, keepdims=True)
        self._words = list(CAPTION_NOUNS) + list(CIFAR10_LABELS)
        cap = _caption_templates().reshape(len(CAPTION_NOUNS), -1)
        clf = _clf_templates().reshape(len(CIFAR10_LABELS), -1)
        # center: the DC offset (127) would otherwise dominate the match
        self._cap_templates = cap - cap.mean(axis=1, keepdims=True)
        self._clf_templates = clf - clf.mean(axis=1, keepdims=True)

    def _text_concept(self, text: str) -> int:
        toks = text.lower().split()
        for i, w in enumerate(self._words):
            if w in toks:
                return i
        return hash(text) % len(self._words)

    def _image_concept(self, image: np.ndarray) -> int:
        flat = image.astype(np.float64).reshape(-1)
        flat = flat - flat.mean()
        cap = self._cap_templates @ flat
        clf = self._clf_templates @ flat
        # normalize by template norms for a fair nearest-template match
        cap = cap / np.linalg.norm(self._cap_templates, axis=1) / max(np.linalg.norm(flat), 1e-9)
        clf = clf / np.linalg.norm(self._clf_templates, axis=1) / max(np.linalg.norm(flat), 1e-9)
        if cap.max() >= clf.max():
            return int(np.argmax(cap))
        return len(CAPTION_NOUNS) + int(np.argmax(clf))

    def _emb(self, concept: int) -> np.ndarray:
        v = self.codebook[concept] + self.noise * self.rng.standard_normal(self.dim)
        return v / np.linalg.norm(v)

    def encode_texts(self, texts):
        return np.stack([self._emb(self._text_concept(t)) for t in texts]).astype(np.float32)

    def encode_images(self, images_u8):
        return np.stack([self._emb(self._image_concept(im)) for im in images_u8]).astype(np.float32)

    def embed_split(self, split, texts, **_):
        idx = np.arange(len(split))
        imgs = load_images(split, idx)
        return self.encode_images(imgs), self.encode_texts(list(texts))
