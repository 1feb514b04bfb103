"""Embed-path timing decomposition on the real TPU (round-2 verdict #3).

Breaks the ViT-B/32 image-embedding pipeline into separately-timed jitted
programs to locate the non-MXU time: preprocessing, the transformer stack,
attention-only, MLP-only, and a seq-64 padded variant. Uses bench.py's
tunnel-safe methodology (scalar fetch forces execution; two-point scan
measurement cancels dispatch overhead).

Run: python benchmarks/probe_embed.py   (one TPU process at a time!)
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from lemon_tpu.core.precision import Precision
from lemon_tpu.models.clip import Attention, ClipConfig, ClipModel, FpLayerNorm, TransformerBlock, init_params
from lemon_tpu.ops.image import preprocess_device

import flax.linen as nn

B = 256
STEPS = (2, 22)


from benchmarks._timing import timed_scalar as timed_scalar  # shared tunnel-safe timing



def two_point(make_run, params, x):
    for s in STEPS:
        timed_scalar(make_run, params, x, s)
    t_small = min(timed_scalar(make_run, params, x, STEPS[0]) for _ in range(3))
    t_large = min(timed_scalar(make_run, params, x, STEPS[1]) for _ in range(3))
    per_step = (t_large - t_small) / (STEPS[1] - STEPS[0])
    return per_step


def scan_runner(apply_fn):
    """Wrap apply(params, x)->array into a steps-scan returning a scalar."""

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(params, x, steps):
        def body(carry, step):
            shifted = jnp.roll(x, step, axis=0)
            out = apply_fn(params, shifted)
            return carry + jnp.sum(out.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return total

    return run


class StackedBlocks(nn.Module):
    """n transformer blocks at ViT-B width, optionally attention- or
    MLP-only, optionally padded to seq 64 with masked keys."""

    n_layers: int = 12
    mode: str = "full"  # full | attn | mlp

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        for i in range(self.n_layers):
            if self.mode in ("full", "attn"):
                x = x + Attention(12, compute_dtype=dt, name=f"attn_{i}")(FpLayerNorm(name=f"ln1_{i}")(x))
            if self.mode in ("full", "mlp"):
                y = FpLayerNorm(name=f"ln2_{i}")(x)
                y = nn.Dense(4 * x.shape[-1], dtype=dt, name=f"fc_{i}")(y)
                y = y * jax.nn.sigmoid(1.702 * y)
                x = x + nn.Dense(x.shape[-1], dtype=dt, name=f"proj_{i}")(y)
        return x


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    results = {}

    # 1) full current pipeline (sanity vs round-1 9.5k img/s)
    cfg = ClipConfig.vit_b32()
    model, params = init_params(cfg, seed=0, precision=Precision.bf16())
    images = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), np.uint8))

    def full_apply(p, imgs):
        pixels = preprocess_device(imgs, size=224, pil_rounding=False)
        emb = model.apply(p, pixels, method=ClipModel.encode_image)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    per = two_point(scan_runner(full_apply), params, images)
    results["full_pipeline"] = per
    print(f"full pipeline: {per * 1e3:.2f} ms/step = {B / per:.0f} img/s", flush=True)

    # 2) preprocess only
    per = two_point(scan_runner(lambda p, imgs: preprocess_device(imgs, size=224, pil_rounding=False)), params, images)
    results["preprocess"] = per
    print(f"preprocess only: {per * 1e3:.2f} ms/step = {B / per:.0f} img/s", flush=True)

    # 3) tower only (pre-resized input)
    pixels = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.float32)
    per = two_point(
        scan_runner(lambda p, px: model.apply(p, px, method=ClipModel.encode_image)), params, pixels
    )
    results["tower"] = per
    print(f"tower only: {per * 1e3:.2f} ms/step = {B / per:.0f} img/s", flush=True)

    # 4-6) block-stack decomposition at (B, 50, 768) bf16
    x50 = jnp.asarray(rng.standard_normal((B, 50, 768)), jnp.bfloat16)
    for mode in ("full", "attn", "mlp"):
        m = StackedBlocks(mode=mode)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x50)
        per = two_point(scan_runner(lambda pp, xx, m=m: m.apply(pp, xx)), p, x50)
        results[f"stack_{mode}_L50"] = per
        print(f"12-block stack [{mode}] L=50: {per * 1e3:.2f} ms/step = {B / per:.0f} img/s", flush=True)

    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
