"""Benchmark: CLIP ViT-B/32 embedding throughput + exact-kNN throughput on
the local accelerator. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline is measured against BASELINE.json's stated target of 50k
ViT-B/32 embeddings/sec/chip (the reference publishes no absolute numbers;
SURVEY.md §6).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_embeddings(batch_size: int = 256, steps: int = 8, warmup: int = 2) -> float:
    import jax
    import jax.numpy as jnp

    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params
    from lemon_tpu.ops.image import preprocess_device

    cfg = ClipConfig.vit_b32()
    model, params = init_params(cfg, seed=0, precision=Precision.bf16())

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (batch_size, 256, 256, 3), np.uint8)

    @jax.jit
    def embed(params, images_u8):
        pixels = preprocess_device(images_u8, size=224, pil_rounding=False)
        emb = model.apply(params, pixels, method=ClipModel.encode_image)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    images_dev = jnp.asarray(images)
    out = embed(params, images_dev)
    out.block_until_ready()
    for _ in range(warmup):
        embed(params, images_dev).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = embed(params, images_dev)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def bench_knn(n_db: int = 100_000, n_q: int = 8192, d: int = 512, k: int = 51) -> float:
    from lemon_tpu.knn import ExactKnnIndex

    rng = np.random.default_rng(1)
    xb = rng.standard_normal((n_db, d)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = rng.standard_normal((n_q, d)).astype(np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)

    index = ExactKnnIndex(metric="ip", tile=8192)
    index.add(xb)
    index.search(xq[:256], k)  # compile
    t0 = time.perf_counter()
    index.search(xq, k)
    dt = time.perf_counter() - t0
    return n_db * n_q / dt


def main():
    import jax

    backend = jax.default_backend()
    emb_rate = bench_embeddings()
    knn_rate = bench_knn()
    result = {
        "metric": "clip_vitb32_image_embeddings_per_sec_per_chip",
        "value": round(emb_rate, 1),
        "unit": "embeddings/s",
        "vs_baseline": round(emb_rate / 50_000.0, 4),
        "knn_pairs_per_sec": round(knn_rate, 0),
        "backend": backend,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
