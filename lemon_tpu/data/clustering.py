"""Caption clustering for pseudo-class labels.

Mirrors lib/datasets/clustering.py:44-75: embed captions with a frozen CLIP
text tower, k-means them, and use cluster ids as class labels for the
deep-kNN baseline. The embedding runs through our batched encoder; k-means
is the jitted Lloyd's in lemon_tpu.ops.kmeans.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from lemon_tpu.models.encoder import ClipEncoder
from lemon_tpu.ops.kmeans import KMeans


class CaptionKMeans:
    """Text-in k-means: predict() takes raw caption strings."""

    def __init__(self, encoder: ClipEncoder, km: KMeans):
        self.encoder = encoder
        self.km = km

    def predict(self, texts: List[str]) -> np.ndarray:
        return self.km.predict(self.encoder.encode_texts(texts))


def cluster_caption_text(
    text_list: List[str],
    n_clusters: int = 100,
    clip_model: str = "huggingface_clip",
    encoder: ClipEncoder | None = None,
    seed: int = 0,
) -> Tuple[CaptionKMeans, np.ndarray]:
    """``seed`` seeds both the (fallback) encoder init and the k-means
    restarts. The reference's FaissKMeans defaults to seed=42, but its RNG
    (faiss's internal sampler) is not reproducible here anyway — cluster
    assignments match in distribution, not bit-for-bit."""
    if encoder is None:
        from lemon_tpu.models.registry import create_encoder

        encoder = create_encoder(clip_model, seed=seed)
    emb = encoder.encode_texts(text_list)
    km = KMeans(n_clusters=n_clusters, seed=seed).fit(emb)
    wrapped = CaptionKMeans(encoder, km)
    return wrapped, km.predict(emb)
