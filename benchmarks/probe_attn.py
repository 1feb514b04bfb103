"""Attention-variant timing on the real TPU (embed-path MFU hunt, round 2).

probe_embed.py showed the 12-block attention stack costs 17.6 ms vs 7.9 ms
for the MLP stack at (256, 50, 768) bf16 — ~44 TFLOPS effective vs ~184 —
so the per-head (50x64) matmuls / layout transitions / softmax are the
bottleneck. Each variant below reimplements ONLY the attention inner body;
qkv/out projections are identical Denses.

Run: python benchmarks/probe_attn.py  (one TPU process at a time)
"""

from __future__ import annotations

import functools
import time

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

B, L, D, H = 256, 50, 768, 12
HD = D // H
STEPS = (2, 22)


from benchmarks._timing import timed_scalar as timed_scalar  # shared tunnel-safe timing



def measure(apply_fn, params, x):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(p, xx, steps):
        def body(carry, step):
            shifted = jnp.roll(xx, step, axis=0)
            out = apply_fn(p, shifted)
            return carry + jnp.sum(out.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return total

    for s in STEPS:
        timed_scalar(run, params, x, s)
    t_small = min(timed_scalar(run, params, x, STEPS[0]) for _ in range(3))
    t_large = min(timed_scalar(run, params, x, STEPS[1]) for _ in range(3))
    return (t_large - t_small) / (STEPS[1] - STEPS[0])


class VariantStack(nn.Module):
    """12 x [LN -> qkv -> inner(variant) -> out] residual blocks."""

    variant: str = "base"
    n_layers: int = 12

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        for i in range(self.n_layers):
            y = nn.LayerNorm(dtype=dt, name=f"ln_{i}")(x)
            qkv = nn.Dense(3 * D, dtype=dt, name=f"qkv_{i}")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            o = self.inner(q, k, v)
            x = x + nn.Dense(D, dtype=dt, name=f"out_{i}")(o)
        return x

    def inner(self, q, k, v):
        b = q.shape[0]
        l = q.shape[1]
        scale = HD ** -0.5
        if self.variant == "base":
            q = q.reshape(b, l, H, HD)
            k = k.reshape(b, l, H, HD)
            v = v.reshape(b, l, H, HD)
            logits = jnp.einsum("blhd,bmhd->bhlm", q * scale, k, preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            return jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, D)
        if self.variant == "sdpa":
            q = q.reshape(b, l, H, HD)
            k = k.reshape(b, l, H, HD)
            v = v.reshape(b, l, H, HD)
            return jax.nn.dot_product_attention(q, k, v).reshape(b, l, D)
        if self.variant == "bf16_softmax":
            q = q.reshape(b, l, H, HD)
            k = k.reshape(b, l, H, HD)
            v = v.reshape(b, l, H, HD)
            logits = jnp.einsum("blhd,bmhd->bhlm", q * scale, k)  # bf16 accum-free
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, D)
        if self.variant == "bh_merged":
            # explicit (B*H, L, HD) batched matmuls
            q = q.reshape(b, l, H, HD).transpose(0, 2, 1, 3).reshape(b * H, l, HD)
            k = k.reshape(b, l, H, HD).transpose(0, 2, 1, 3).reshape(b * H, l, HD)
            v = v.reshape(b, l, H, HD).transpose(0, 2, 1, 3).reshape(b * H, l, HD)
            logits = jnp.einsum("zld,zmd->zlm", q * scale, k, preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum("zlm,zmd->zld", probs, v)
            return o.reshape(b, H, l, HD).transpose(0, 2, 1, 3).reshape(b, l, D)
        if self.variant == "pad64":
            pad = 64 - l
            qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))).reshape(b, 64, H, HD)
            kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0))).reshape(b, 64, H, HD)
            vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0))).reshape(b, 64, H, HD)
            logits = jnp.einsum("blhd,bmhd->bhlm", qp * scale, kp, preferred_element_type=jnp.float32)
            neg = jnp.where(jnp.arange(64) < l, 0.0, -jnp.inf).astype(jnp.float32)
            probs = jax.nn.softmax(logits + neg[None, None, None, :], axis=-1).astype(vp.dtype)
            o = jnp.einsum("bhlm,bmhd->blhd", probs, vp).reshape(b, 64, D)
            return o[:, :l]
        if self.variant == "no_softmax":
            q = q.reshape(b, l, H, HD)
            k = k.reshape(b, l, H, HD)
            v = v.reshape(b, l, H, HD)
            logits = jnp.einsum("blhd,bmhd->bhlm", q * scale, k, preferred_element_type=jnp.float32)
            return jnp.einsum("bhlm,bmhd->blhd", logits.astype(v.dtype), v).reshape(b, l, D)
        raise ValueError(self.variant)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    for variant in ("base", "sdpa", "bf16_softmax", "bh_merged", "pad64", "no_softmax"):
        m = VariantStack(variant=variant)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        per = measure(lambda pp, xx, m=m: m.apply(pp, xx), p, x)
        print(f"{variant:14s}: {per * 1e3:7.2f} ms/step = {B / per:7.0f} img/s-equiv", flush=True)


if __name__ == "__main__":
    main()
