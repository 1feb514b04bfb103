"""Attention cost isolation, part 2: projections vs layout vs inner matmuls.

Run: python benchmarks/probe_attn2.py  (one TPU process at a time)
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

B, L, D, H = 256, 50, 768, 12
HD = D // H
STEPS = (2, 22)


from benchmarks._timing import timed_scalar as timed_scalar  # shared tunnel-safe timing



def measure(fn, *arrays):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(steps, *args):
        def body(carry, step):
            shifted = jax.tree_util.tree_map(lambda a: jnp.roll(a, step, axis=0), args)
            out = fn(*shifted)
            return carry + jnp.sum(out.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return total

    for s in STEPS:
        timed_scalar(functools.partial(run, s), *arrays)
    t_small = min(timed_scalar(functools.partial(run, STEPS[0]), *arrays) for _ in range(3))
    t_large = min(timed_scalar(functools.partial(run, STEPS[1]), *arrays) for _ in range(3))
    return (t_large - t_small) / (STEPS[1] - STEPS[0])


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
    q4 = jnp.asarray(rng.standard_normal((B, H, L, HD)), jnp.bfloat16)
    k4 = jnp.asarray(rng.standard_normal((B, H, L, HD)), jnp.bfloat16)
    v4 = jnp.asarray(rng.standard_normal((B, H, L, HD)), jnp.bfloat16)

    # 1) projections only, 12 layers
    def proj_only(x):
        for _ in range(12):
            qkv = x @ wqkv
            x = qkv[..., :D] @ wout
        return x

    per = measure(proj_only, x)
    print(f"proj_only      : {per*1e3:7.2f} ms  ({B/per:7.0f} img/s-equiv)", flush=True)

    # 2) inner attention from native (B,H,L,HD) — no layout changes, bf16 softmax
    def inner_native(q, k, v):
        out = q
        for _ in range(12):
            logits = jnp.einsum("bhld,bhmd->bhlm", out * HD ** -0.5, k)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhlm,bhmd->bhld", probs, v)
        return out

    per = measure(inner_native, q4, k4, v4)
    print(f"inner_native   : {per*1e3:7.2f} ms", flush=True)

    # 3) inner attention incl. the (B,L,H,HD)<->(B,H,L,HD) layout round trip
    ql = jnp.asarray(rng.standard_normal((B, L, 3 * D)), jnp.bfloat16)

    def inner_with_layout(qkv):
        out = qkv
        for _ in range(12):
            q, k, v = jnp.split(out, 3, axis=-1)
            q = q.reshape(B, L, H, HD)
            k = k.reshape(B, L, H, HD)
            v = v.reshape(B, L, H, HD)
            logits = jnp.einsum("blhd,bmhd->bhlm", q * HD ** -0.5, k)
            probs = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, D)
            out = jnp.concatenate([o, o, o], axis=-1)
        return out

    per = measure(inner_with_layout, ql)
    print(f"inner_layout   : {per*1e3:7.2f} ms", flush=True)

    # 4) packed sequences: 2 images per row, block-diagonal mask (L=100)
    xp = jnp.asarray(rng.standard_normal((B // 2, H, 2 * L, HD)), jnp.bfloat16)
    blockmask = np.zeros((2 * L, 2 * L), np.float32)
    blockmask[:L, L:] = -1e9
    blockmask[L:, :L] = -1e9
    bm = jnp.asarray(blockmask, jnp.bfloat16)

    def inner_packed(q):
        out = q
        for _ in range(12):
            logits = jnp.einsum("bhld,bhmd->bhlm", out * HD ** -0.5, out) + bm
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhlm,bhmd->bhld", probs, out)
        return out

    per = measure(inner_packed, xp)
    print(f"inner_packed2  : {per*1e3:7.2f} ms", flush=True)

    # 5) packed x4 (L=200), B/4 rows
    xp4 = jnp.asarray(rng.standard_normal((B // 4, H, 4 * L, HD)), jnp.bfloat16)
    m4 = np.full((4 * L, 4 * L), -1e9, np.float32)
    for i in range(4):
        m4[i * L:(i + 1) * L, i * L:(i + 1) * L] = 0.0
    bm4 = jnp.asarray(m4, jnp.bfloat16)

    def inner_packed4(q):
        out = q
        for _ in range(12):
            logits = jnp.einsum("bhld,bhmd->bhlm", out * HD ** -0.5, out) + bm4
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhlm,bhmd->bhld", probs, out)
        return out

    per = measure(inner_packed4, xp4)
    print(f"inner_packed4  : {per*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
