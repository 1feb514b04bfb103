"""Pallas fused attention (flash-style) for TPU — EXPERIMENTAL.

Status (explicit, per the round-2 review): this kernel LOSES to the XLA
attention path at every sequence length in the framework's model zoo, all
measured on a real v5e (BENCH_NOTES.md): L=50 vision 6,133 vs 9,505 img/s
(round 1); ctx-256 MIMIC text 2,762 vs 3,850 txt/s with packing (round 2).
No shipped configuration uses it — ``ClipConfig.attention_impl='pallas'``
is an opt-in experiment, retained because flash attention's O(L) memory
is the only viable path at genuinely long contexts (thousands of tokens),
which no current model in scope reaches. The measured Pallas wins in this
codebase are the kNN kernels (ops/scoremax.py, ops/topk.py); the embed
fast path's throughput lever is int8 projections (core/precision.py
``matmul_int8``), not this kernel.

One kernel computes q@k^T, the (optionally causal) online softmax, and
the @v contraction without materializing the (L, L) probability matrix in
HBM.

Layout: (B, H, L, D) with the grid over (batch*heads, q-blocks) and an
inner fori_loop over kv-blocks carrying the running max / normalizer /
accumulator in VMEM scratch — the standard online-softmax recurrence.
Block sizes default to 128 (MXU tile); inputs are padded to block
multiples and padded keys masked to -inf.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, causal: bool, sm_scale: float, kv_blocks: int, block_kv: int, n_valid: int):
    """One (bh, q-block) program: online softmax over kv blocks."""
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (block_q, d)
    block_q = q.shape[0]
    q_idx = pl.program_id(1) * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)

    def body(step, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(step * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(step * block_kv, block_kv), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bkv)
        kv_idx = step * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
        mask = kv_idx < n_valid
        if causal:
            mask = jnp.logical_and(mask, kv_idx <= q_idx)
        s = jnp.where(mask, s, _NEG_INF)

        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, q.shape[1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, kv_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    block_q: int = 128,
    block_kv: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused attention over (B, L, H, D) inputs (the layout the CLIP towers
    produce); returns the same layout. fp32 accumulation regardless of
    input dtype. ``interpret=None`` auto-enables the Pallas interpreter on
    non-TPU backends (the Mosaic kernel only compiles for TPU)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention(q, k, v, causal=causal, block_q=block_q, block_kv=block_kv, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_kv", "interpret"))
def _flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool,
    block_q: int,
    block_kv: int,
    interpret: bool,
) -> jnp.ndarray:
    b, l, h, d = q.shape
    sm_scale = d ** -0.5

    # (B, L, H, D) -> (B*H, L, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, l, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    block_q_eff = min(block_q, max(8, 1 << (l - 1).bit_length()))
    block_kv_eff = min(block_kv, max(8, 1 << (l - 1).bit_length()))
    qb = _pad_to(qb, 1, block_q_eff)
    kb = _pad_to(kb, 1, block_kv_eff)
    vb = _pad_to(vb, 1, block_kv_eff)
    lq = qb.shape[1]
    lkv = kb.shape[1]
    kv_blocks = lkv // block_kv_eff

    grid = (b * h, lq // block_q_eff)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel,
            causal=causal,
            sm_scale=sm_scale,
            kv_blocks=kv_blocks,
            block_kv=block_kv_eff,
            n_valid=l,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q_eff, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkv, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkv, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q_eff, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :l, :].reshape(b, h, l, d).transpose(0, 2, 1, 3)
    return out


def reference_attention(q, k, v, causal: bool = False):
    """Plain XLA attention over (B, L, H, D), the parity oracle."""
    d = q.shape[-1]
    logits = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32) * (d ** -0.5), k.astype(jnp.float32))
    if causal:
        l = q.shape[1]
        mask = jnp.tril(jnp.ones((l, l), bool))
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v.astype(jnp.float32)).astype(q.dtype)
