"""A/B the int8 (W8A8 projections) embed fast path against bf16 on the
real TPU, with a small batch sweep (the optimal batch can shift when the
matmuls get ~1.8x faster and the attention core does not).

Run: python benchmarks/probe_int8_embed.py   (one TPU process at a time!)
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks._timing import timed_scalar  # noqa: E402

from lemon_tpu.core.precision import Precision  # noqa: E402
from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params, quantize_clip_params  # noqa: E402
from lemon_tpu.ops.image import preprocess_device  # noqa: E402


def embed_rate(precision: Precision, batch_size: int, steps=(2, 42), text=False) -> float:
    cfg = ClipConfig.vit_b32()
    model, params = init_params(cfg, seed=0, precision=precision)
    if precision.matmul_int8:
        params = quantize_clip_params(params)
    rng = np.random.default_rng(0)
    if text:
        data = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch_size, 77)), jnp.int32)
        method = ClipModel.encode_text
        prep = lambda x: x
    else:
        data = jnp.asarray(rng.integers(0, 256, (batch_size, 256, 256, 3), np.uint8))
        method = ClipModel.encode_image
        prep = lambda x: preprocess_device(x, size=224, pil_rounding=False, precision="default")

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(params, raw, steps):
        def body(carry, step):
            shifted = jnp.roll(raw, step, axis=0)
            emb = model.apply(params, prep(shifted), method=method)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return carry + jnp.sum(emb.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return total

    for s in steps:
        timed_scalar(run, params, data, s)
    t_small = min(timed_scalar(run, params, data, steps[0]) for _ in range(3))
    t_large = min(timed_scalar(run, params, data, steps[1]) for _ in range(3))
    return batch_size * (steps[1] - steps[0]) / max(t_large - t_small, 1e-9)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    for label, prec in (("bf16", Precision.bf16()), ("int8", Precision.int8())):
        for b in (128, 256) if label == "bf16" else (128, 192, 256, 384):
            r = embed_rate(prec, b)
            results[f"img_{label}_b{b}"] = round(r, 0)
            print(f"image {label:5s} B={b:4d}: {r:9.0f} img/s", flush=True)
    for label, prec in (("bf16", Precision.bf16()), ("int8", Precision.int8())):
        for b in (96,) if label == "bf16" else (96, 192, 256):
            r = embed_rate(prec, b, steps=(2, 22), text=True)
            results[f"txt_{label}_b{b}"] = round(r, 0)
            print(f"text  {label:5s} B={b:4d}: {r:9.0f} txt/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
