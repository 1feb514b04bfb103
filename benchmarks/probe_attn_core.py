"""Current-config attention-core decomposition (round 3).

The round-2 numbers (17.6 ms attention of a 25.1 ms stack at B=256
UNPACKED) predate attention packing, B=128, bf16 softmax and the pooled
last block. Before investing in a fused Pallas attention-core kernel
(head-pair K'/V' packing in VMEM), measure where the CURRENT shipped
configuration actually spends its time:

  stack_full       - 12 packed blocks (the shipped tower inner)
  stack_attn       - qkv + core + out only
  stack_mlp        - fc + gelu + proj only
  core_only        - logits+softmax+AV on fixed (q,k,v), packed mask
  core_fp32sm      - same, fp32 softmax (current bf16 softmax win check)
  core_headpair    - XLA emulation of the head-pair trick: zero-padded
                     K'/V' block-diagonal in lanes, one (L,128)x(128,2L)
                     matmul per head pair. Bounds the Pallas kernel's win:
                     the kernel saves exactly the K'/V' construction cost
                     on top of whatever this variant shows.

Run: python benchmarks/probe_attn_core.py   (one TPU process at a time!)
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks._timing import timed_scalar  # noqa: E402

from lemon_tpu.core.precision import Precision  # noqa: E402
from lemon_tpu.models.clip import (  # noqa: E402
    Attention,
    ClipConfig,
    ClipModel,
    FpLayerNorm,
    _block_diag_mask,
    init_params,
)
from lemon_tpu.ops.image import preprocess_device  # noqa: E402

B = 128          # shipped embed batch
PACK = 2
L = 50
LP = PACK * L    # packed row length
D = 768
H = 12
HD = D // H
ROWS = B // PACK
STEPS = (2, 22)


def two_point(run, *args):
    for s in STEPS:
        timed_scalar(run, *args, s)
    t_small = min(timed_scalar(run, *args, STEPS[0]) for _ in range(3))
    t_large = min(timed_scalar(run, *args, STEPS[1]) for _ in range(3))
    return (t_large - t_small) / (STEPS[1] - STEPS[0])


def scan_runner(apply_fn):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(params, x, steps):
        def body(carry, step):
            out = apply_fn(params, x + carry.astype(x.dtype) * 1e-6)
            return jnp.sum(out.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return total

    return run


class PackedStack(nn.Module):
    """12 packed ViT-B blocks, optionally attention-/MLP-only — the shipped
    tower inner exactly (bf16 compute, bf16 softmax, block-diag mask).
    ``int8`` switches the four projections to QuantDense (the shipped int8
    mode) to locate where the full int8 path loses what the isolated
    matmul stack gains (probe_int8_static: int8_dyn 4.55 vs bf16 6.29 ms)."""

    mode: str = "full"
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        from lemon_tpu.models.clip import QuantDense

        mask = _block_diag_mask(PACK, L, causal=False)
        mk = (lambda f, name: QuantDense(f, dtype=jnp.bfloat16, name=name)) if self.int8 else (
            lambda f, name: nn.Dense(f, dtype=jnp.bfloat16, name=name))
        for i in range(12):
            if self.mode in ("full", "attn"):
                x = x + Attention(
                    H, compute_dtype=jnp.bfloat16, softmax_dtype=jnp.bfloat16,
                    matmul_int8=self.int8, name=f"attn_{i}"
                )(FpLayerNorm(name=f"ln1_{i}")(x), mask)
            if self.mode in ("full", "mlp"):
                y = FpLayerNorm(name=f"ln2_{i}")(x)
                y = mk(4 * D, f"fc_{i}")(y)
                y = y * jax.nn.sigmoid(1.702 * y)
                x = x + mk(D, f"proj_{i}")(y)
        return x


def core_xla(q, k, v, softmax_dtype):
    """The shipped attention core on fixed q,k,v (12 layers chained)."""
    mask = _block_diag_mask(PACK, L, causal=False)
    scale = HD ** -0.5

    def one(qq):
        logits = jnp.einsum("blhd,bmhd->bhlm", qq * scale, k, preferred_element_type=softmax_dtype)
        logits = logits + mask.astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhlm,bmhd->blhd", probs, v)

    out = q
    for _ in range(12):
        out = one(out)  # serial chain: 12 core passes, no DCE
    return out


def core_headpair(q, k, v, softmax_dtype):
    """Head-pair emulation: Q' (R, 3, L, 128) = two heads side-by-side in
    lanes; K'/V' (R, 3, 2L, 128) block-diagonal. One matmul per head PAIR
    with a 128-wide contraction. Numerically identical to core_xla."""
    mask2 = jnp.concatenate([_block_diag_mask(PACK, L, False)] * 2, axis=-1)  # (1,1,LP,2LP)
    scale = HD ** -0.5
    zeros = jnp.zeros((ROWS, H // 2, LP, HD), q.dtype)

    def pack_kv(t):
        # (R, LP, H, HD) -> (R, H/2, 2*LP, 128) block-diag in lanes
        t = t.transpose(0, 2, 1, 3)  # (R, H, LP, HD)
        a, b = t[:, 0::2], t[:, 1::2]  # (R, H/2, LP, HD) each
        top = jnp.concatenate([a, zeros], axis=-1)   # [K_a | 0]
        bot = jnp.concatenate([zeros, b], axis=-1)   # [0 | K_b]
        return jnp.concatenate([top, bot], axis=2)   # (R, H/2, 2LP, 128)

    def pack_q(t):
        t = t.transpose(0, 2, 1, 3)
        return jnp.concatenate([t[:, 0::2], t[:, 1::2]], axis=-1)  # (R, H/2, LP, 128)

    def one(qq):
        qp = pack_q(qq) * scale
        kp = pack_kv(k)
        vp = pack_kv(v)
        logits = jnp.einsum("rhld,rhmd->rhlm", qp, kp, preferred_element_type=softmax_dtype)
        logits = logits + mask2.astype(logits.dtype)
        # halves are different heads: softmax per half
        la, lb = logits[..., :LP], logits[..., LP:]
        pa = jax.nn.softmax(la, axis=-1).astype(vp.dtype)
        pb = jax.nn.softmax(lb, axis=-1).astype(vp.dtype)
        probs = jnp.concatenate([pa, pb], axis=-1)
        op = jnp.einsum("rhlm,rhmd->rhld", probs, vp)  # (R, H/2, LP, 128)
        oa, ob = op[..., :HD], op[..., HD:]
        out = jnp.stack([oa, ob], axis=2).reshape(ROWS, H, LP, HD)
        return out.transpose(0, 2, 1, 3)  # (R, LP, H, HD)

    out = q
    for _ in range(12):
        out = one(out)
    return out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    results = {}

    # sanity: full shipped pipeline
    cfg = ClipConfig.vit_b32()
    model, params = init_params(cfg, seed=0, precision=Precision.bf16())
    images = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), np.uint8))

    def full_apply(p, imgs):
        pixels = preprocess_device(imgs, size=224, pil_rounding=False, precision="default")
        emb = model.apply(p, pixels, method=ClipModel.encode_image)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    per = two_point(scan_runner(full_apply), params, images)
    results["full_pipeline_ms"] = round(per * 1e3, 3)
    print(f"full pipeline: {per * 1e3:.2f} ms = {B / per:.0f} img/s", flush=True)

    # int8 full pipeline (sanity vs probe_int8_embed's 11.1k at B=128)
    model8, params8 = init_params(cfg, seed=0, precision=Precision.int8())
    from lemon_tpu.models.clip import quantize_clip_params

    params8 = quantize_clip_params(params8)

    def full_apply8(p, imgs):
        pixels = preprocess_device(imgs, size=224, pil_rounding=False, precision="default")
        emb = model8.apply(p, pixels, method=ClipModel.encode_image)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    per = two_point(scan_runner(full_apply8), params8, images)
    results["full_pipeline_int8_ms"] = round(per * 1e3, 3)
    print(f"full pipeline int8: {per * 1e3:.2f} ms = {B / per:.0f} img/s", flush=True)

    x = jnp.asarray(rng.standard_normal((ROWS, LP, D)) * 0.1, jnp.bfloat16)
    for mode, int8 in (("full", False), ("attn", False), ("mlp", False), ("full", True), ("attn", True)):
        m = PackedStack(mode=mode, int8=int8)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        if int8:
            p = quantize_clip_params(p)
        tag = f"stack_{mode}{'_int8' if int8 else ''}"
        per = two_point(scan_runner(lambda pp, xx, m=m: m.apply(pp, xx)), p, x)
        results[tag + "_ms"] = round(per * 1e3, 3)
        print(f"{tag}: {per * 1e3:.2f} ms = {B / per:.0f} img/s", flush=True)

    q = jnp.asarray(rng.standard_normal((ROWS, LP, H, HD)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((ROWS, LP, H, HD)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((ROWS, LP, H, HD)) * 0.1, jnp.bfloat16)

    def core_runner(fn, softmax_dtype):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def run(q, k, v, steps):
            def body(carry, step):
                out = fn(q + carry.astype(q.dtype) * 1e-6, k, v, softmax_dtype)
                return jnp.sum(out.astype(jnp.float32)), ()

            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
            return total

        return run

    for name, fn, dt in (
        ("core_only", core_xla, jnp.bfloat16),
        ("core_fp32sm", core_xla, jnp.float32),
        ("core_headpair", core_headpair, jnp.bfloat16),
    ):
        run = core_runner(fn, dt)
        per = two_point(run, q, k, v)
        results[name + "_ms"] = round(per * 1e3, 3)
        print(f"{name}: {per * 1e3:.2f} ms / 12 core passes", flush=True)

    # numeric check headpair == xla (on CPU-sized slice here, bf16 tolerance)
    ref = core_xla(q, k, v, jnp.bfloat16)
    got = core_headpair(q, k, v, jnp.bfloat16)
    diff = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    results["headpair_maxdiff"] = diff
    print(f"headpair max diff vs xla: {diff:.3e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
