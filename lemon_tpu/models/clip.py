"""Flax CLIP: vision transformer + text transformer towers.

TPU-native re-design of the CLIP family used by the reference
(/root/reference/lib/models/chexzero_clip.py:263-392 and the HuggingFace
``openai/clip-vit-base-patch32`` path in run_lemon.py:112-115):

- Patch embedding is a reshape + one large matmul instead of a strided conv
  (bit-identical for non-overlapping patches, and it maps straight onto the
  MXU without relying on conv lowering).
- Attention is a single fused QKV projection + scaled dot-product; a Pallas
  flash-attention kernel can be slotted in via ``attention_impl='pallas'``
  (at CLIP's 50/77-token sequences the XLA-fused path is already
  compute-bound, so 'xla' is the default).
- LayerNorm always computes in fp32 regardless of the compute dtype,
  matching CLIP's fp16-safe LayerNorm (chexzero_clip.py:177-183).
- Text pooling takes the hidden state at the first-EOT position (argmax of
  token ids, chexzero_clip.py:374) and projects it.

Weight compatibility: :mod:`lemon_tpu.models.loader` converts both
HuggingFace ``CLIPModel`` checkpoints and OpenAI/chexzero state dicts into
this module's parameter pytree; outputs are parity-tested against
``transformers.CLIPModel`` to fp32 tolerance in tests/test_clip_parity.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lemon_tpu.core.precision import Precision


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    # Vision tower. ``vision_layers`` follows the reference convention
    # (chexzero_clip.py:283-303): an int selects the ViT tower; a 4-tuple of
    # Bottleneck counts selects ModifiedResNet (models/resnet.py).
    image_resolution: int = 224
    vision_layers: int | tuple = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    vision_heads: Optional[int] = None  # default: width // 64
    # Text tower
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    # QuickGELU (x * sigmoid(1.702 x)) is what OpenAI CLIP checkpoints use.
    quick_gelu: bool = True
    attention_impl: str = "xla"  # 'xla' | 'pallas'
    # Pack P sequences per attention row with a block-diagonal mask.
    # LN/MLP are per-token, so the whole transformer runs packed with exact
    # semantics; at the vision tower's 50 tokens the per-head matmuls
    # underfill the 128x128 MXU and packing 2 images (L=100) ran the
    # attention inner ~4x faster on v5e (BENCH_NOTES round 2). Batches not
    # divisible by P fall back to unpacked.
    attention_pack: int = 2
    # Text packing is separate and OFF by default: at L=77 the packed row
    # (154) fills the 128-lane MXU tile no better than unpacked (60%
    # either way) while doubling the logits/probs FLOPs — measured
    # pack1/B=128 20.7k vs pack2/B=256 15.4k txt/s on v5e. (The round-2
    # ctx-256 comparison that favored 'packing' was packed-XLA vs
    # unpacked-Pallas, not packed-vs-unpacked XLA.)
    text_attention_pack: int = 1
    # timm-style ViT variations (BiomedCLIP's visual trunk): patch-embed
    # bias, no pre-LayerNorm.
    vision_patch_bias: bool = False
    vision_ln_pre: bool = True
    # Only the pooled row (vision CLS / text first-EOT) survives each
    # tower's head, so the LAST transformer block's attention core,
    # output projection, and MLP need only that row — K/V still come from
    # every token, making this exact (row-wise ops are independent across
    # rows; measured +20% embed throughput on v5e). Effective only when
    # Precision.pool_last_block is also set (the bf16 fast path): the row
    # restriction changes BLAS blocking and therefore float-level
    # summation order, which the fp32 AUROC-parity path must not do.
    # Disabled automatically when full token states are requested
    # (return_tokens) or under the Pallas flash kernel.
    pool_last_block: bool = True
    # Same trick for the text tower. Off by default: the EOT row index is
    # data-dependent (unlike the vision CLS's constant position), and the
    # per-example row/mask gathers cost more than the saved compute on
    # v5e — measured 16.3k pooled vs 18.7k unpooled txt/s (same-conditions
    # A/B, B=256 pack=2 bf16). The code path stays for shapes where the
    # saved MLP dominates (long contexts).
    pool_last_block_text: bool = False

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision_layers, (tuple, list))

    @property
    def v_heads(self) -> int:
        if self.vision_heads:
            return self.vision_heads
        # RN attnpool heads: width*32 // 64 (chexzero_clip.py:300)
        return (self.vision_width * 32 if self.is_resnet else self.vision_width) // 64

    @property
    def grid(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @staticmethod
    def vit_b32() -> "ClipConfig":
        """openai/clip-vit-base-patch32 (run_lemon.py:113)."""
        return ClipConfig()

    @staticmethod
    def vit_b16(embed_dim: int = 512, context_length: int = 77) -> "ClipConfig":
        """ViT-B/16 as used by the from-scratch MIMIC/CC3M models
        (chexzero_clip.py:458-470 uses embed_dim=768, context 256)."""
        return ClipConfig(
            embed_dim=embed_dim,
            vision_patch_size=16,
            context_length=context_length,
        )

    @staticmethod
    def rn50() -> "ClipConfig":
        """OpenAI CLIP RN50 (ModifiedResNet visual tower)."""
        return ClipConfig(embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64)

    @staticmethod
    def tiny_rn() -> "ClipConfig":
        """Test-scale ModifiedResNet config (full code path, toy sizes)."""
        return ClipConfig(
            embed_dim=32,
            image_resolution=64,
            vision_layers=(1, 1, 1, 1),
            vision_width=8,
            context_length=16,
            text_width=64,
            text_heads=2,
            text_layers=2,
        )

    @staticmethod
    def from_scratch_mimic() -> "ClipConfig":
        return ClipConfig.vit_b16(embed_dim=768, context_length=256)

    @staticmethod
    def tiny(vocab_size: int = 49408) -> "ClipConfig":
        """Small config for tests: full code path, toy sizes."""
        return ClipConfig(
            embed_dim=32,
            image_resolution=32,
            vision_layers=2,
            vision_width=64,
            vision_patch_size=16,
            context_length=16,
            vocab_size=vocab_size,
            text_width=64,
            text_heads=2,
            text_layers=2,
        )


class FpLayerNorm(nn.Module):
    """LayerNorm with fp32 statistics; the normalize/affine math runs in
    ``dtype`` (fp32 parity default, matching CLIP's fp16-safe LayerNorm,
    chexzero_clip.py:177-183; bf16 on the fast path — mean/var stay fp32
    so only the elementwise tail loses mantissa bits)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        if self.dtype == jnp.float32:
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
            return (y * scale + bias).astype(orig)
        # bf16 tail: halves the bytes through the VPU; the (B, L, 1) stats
        # and (D,) affine params cast down are negligible
        inv = jax.lax.rsqrt(var + self.epsilon).astype(self.dtype)
        y = (x.astype(self.dtype) - mean.astype(self.dtype)) * inv
        return (y * scale.astype(self.dtype) + bias.astype(self.dtype)).astype(orig)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LnParams(nn.Module):
    """Param-only stand-in for FpLayerNorm (same scope/param names) used by
    the folded-LN fast path; checkpoints load interchangeably."""

    @nn.compact
    def __call__(self, dim):
        return (
            self.param("scale", nn.initializers.ones, (dim,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (dim,), jnp.float32),
        )


class DenseParams(nn.Module):
    """Param-only stand-in for nn.Dense (same scope/param names/inits)."""

    features: int

    @nn.compact
    def __call__(self, in_features):
        return (
            self.param("kernel", nn.initializers.lecun_normal(), (in_features, self.features), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32),
        )


def ln_folded_dense(x, kernel, bias, g, beta, *, compute_dtype, epsilon=1e-5):
    """``Dense(LN(x))`` without materializing LN(x).

    LN's output feeds only the projection here, so fold it algebraically:
    ``LN(x) @ W = r*(x @ (g*W)) - (r*mu)*colsum(g*W) + (beta @ W + b)``
    with per-row fp32 stats (mu, r) and fp32-precomputed weight/constant
    transforms (XLA hoists them out of step loops). Replaces LN's
    normalize + write + re-read full-tensor passes with one stats read and
    a fused matmul epilogue — measured +? img/s on the packed embed path
    (BENCH_NOTES round 2). Exact up to matmul rounding: the bf16 rounding
    happens on ``g*W`` instead of on ``LN(x)``.
    """
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + epsilon)
    w_scaled = kernel * g[:, None]
    c1 = jnp.sum(w_scaled, axis=0)
    c2 = beta @ kernel + bias
    z = jnp.dot(
        x.astype(compute_dtype), w_scaled.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    z = z * r - (r * mu) * c1 + c2
    return z.astype(compute_dtype)


class QuantDense(nn.Module):
    """W8A8 quantized Dense for the int8 fast path.

    Parameters are the PRE-quantized ``kernel_q`` (int8) and per-output-
    channel ``kernel_scale`` produced once by :func:`quantize_clip_params`
    — quantizing inside the step would re-read every weight per batch.
    The int8xint8->int32 dot runs at ~1.8x the bf16 MXU rate on v5e
    (benchmarks/probe_pallas_int8.py). The dequant epilogue applies both
    scales and the bias in fp32, returning ``dtype``.

    Activation quantization has two modes:

    - dynamic (default): per-token symmetric max-abs scale computed on the
      fly. Robust, but the amax reduce + divide is an extra VPU pass per
      projection that XLA cannot fuse *through* the dot (measured 4.55 vs
      3.64 ms static on the 12-block matmul stack, v5e —
      benchmarks/probe_int8_static.py).
    - static (``static_act=True``): one calibrated per-layer scalar
      ``act_scale`` param; the quantize is a multiply+round that fuses
      into the preceding LN/GELU epilogue. Scales come from
      :func:`calibrate_act_scales` (symmetric max-abs over a calibration
      batch); uncalibrated all-ones scales give garbage — the encoder
      calibrates lazily on its first batch.

    Either way the layer sows its observed activation max-abs into the
    ``act_stats`` collection — a no-op (dead code, DCE'd) unless the
    caller makes that collection mutable, which is exactly what
    calibration does.

    ``weight_only=True`` keeps the SAME param tree (int8 ``kernel_q`` +
    ``kernel_scale``, plus the ``act_scale`` placeholder under
    ``static_act``) but dequantizes the kernel and runs an ordinary
    ``dtype`` matmul with UNQUANTIZED activations. This is the right
    call when the row count is tiny: in the pooled last block (M = one
    CLS row per image) the per-row activation quantize plus a starved
    M=128 int8 dot cost ~0.3 ms MORE than a full-length int8 block —
    the single largest residual in the round-4 int8_static pipeline
    decomposition (BENCH_NOTES; benchmarks/probe_int8_decomp.py). The
    per-step kernel dequant is ~5M multiplies for ViT-B/32's last block,
    noise next to the matmuls it feeds, and dropping the activation
    quantize makes the result strictly MORE faithful to fp32.
    """

    features: int
    dtype: Any = jnp.bfloat16
    static_act: bool = False
    weight_only: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros, (d, self.features), jnp.int8)
        kernel_scale = self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        lead = x.shape[:-1]
        xf = x.reshape(-1, d).astype(jnp.float32)
        self.sow(
            "act_stats",
            "act_amax",
            jnp.max(jnp.abs(xf)),
            reduce_fn=jnp.maximum,
            init_fn=lambda: jnp.float32(0),
        )
        if self.weight_only:
            if self.static_act:  # keep the param tree identical either way
                self.param("act_scale", nn.initializers.ones, (), jnp.float32)
            w = (kernel_q.astype(jnp.float32) * kernel_scale).astype(self.dtype)
            y = jax.lax.dot_general(
                x.reshape(-1, d).astype(self.dtype), w,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bias
        elif self.static_act:
            act_scale = self.param("act_scale", nn.initializers.ones, (), jnp.float32)
            a_q = jnp.clip(jnp.round(xf / act_scale), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                a_q, kernel_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = acc.astype(jnp.float32) * (act_scale * kernel_scale) + bias
        else:
            a_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
            a_q = jnp.round(xf / a_scale).astype(jnp.int8)
            acc = jax.lax.dot_general(
                a_q, kernel_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = acc.astype(jnp.float32) * a_scale * kernel_scale + bias
        return y.reshape(*lead, self.features).astype(self.dtype)


# scope names whose nn.Dense kernels the int8 mode replaces (the four big
# projections; LN/softmax/attention core/tower heads stay float)
_INT8_SCOPES = ("qkv", "out", "mlp_fc", "mlp_proj")


def quantize_clip_params(params, static_act: bool = False):
    """fp32 ClipModel params → the tree :class:`QuantDense` consumes:
    every ``kernel`` under an _INT8_SCOPES scope becomes per-output-channel
    symmetric ``kernel_q``/``kernel_scale``. One host pass at encoder
    build; everything else passes through unchanged. ``static_act`` adds
    an all-ones ``act_scale`` placeholder per quantized layer —
    :func:`calibrate_act_scales` must fill it before real use.

    The ``text`` subtree is skipped: int8 is vision-only (the text tower
    measured slower under int8 at every batch size on v5e — see
    ClipModel.setup), so its nn.Dense layers must keep their ``kernel``."""

    def walk(tree, under_scope=False):
        out = {}
        for key, val in tree.items():
            if key == "text" and isinstance(val, dict):
                out[key] = val  # text tower stays float (vision-only int8)
            elif isinstance(val, dict):
                out[key] = walk(val, under_scope=key in _INT8_SCOPES)
            elif key == "kernel" and under_scope:
                w = np.asarray(val, np.float32)
                scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
                out["kernel_q"] = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
                out["kernel_scale"] = scale.astype(np.float32)
                if static_act:
                    out["act_scale"] = np.float32(1.0)
            else:
                out[key] = val
        return out

    return walk(params)


def quantize_clip_params_jit(params, static_act: bool = False):
    """Device-side :func:`quantize_clip_params`: one jitted program, no
    host round-trip. The host-numpy variant fetches every kernel to the
    host (``np.asarray``) — ~600 MB down a tunneled TPU's relay for
    ViT-B/32 when the tree lives on device (jitted random init), which
    dominated the int8 probes' setup time. Use this whenever the tree is
    already device-resident; keep the numpy variant for host checkpoint
    trees (quantize-then-upload moves ~1.7x fewer bytes than
    upload-then-quantize)."""

    def walk(tree, under_scope=False):
        out = {}
        for key, val in tree.items():
            if key == "text" and isinstance(val, dict):
                out[key] = val  # text tower stays float (vision-only int8)
            elif isinstance(val, dict):
                out[key] = walk(val, under_scope=key in _INT8_SCOPES)
            elif key == "kernel" and under_scope:
                w = val.astype(jnp.float32)
                scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
                out["kernel_q"] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
                out["kernel_scale"] = scale
                if static_act:
                    out["act_scale"] = jnp.float32(1.0)
            else:
                out[key] = val
        return out

    return jax.jit(walk)(params)


def calibrate_act_scales(model, params, pixels=None, tokens=None, margin: float = 1.0):
    """Fill the static ``act_scale`` params from observed activations.

    Runs ``encode_image`` on ``pixels`` and/or ``encode_text`` on
    ``tokens`` with the ``act_stats`` collection mutable (every QuantDense
    sows its input max-abs there; the sow is dead code on normal applies)
    and writes ``act_scale = margin * amax / 127`` at each quantized
    layer. Returns the updated param tree; scopes a given method never
    touches keep their existing scales, so per-tower lazy calibration
    composes."""

    def write(ptree, stats):
        out = dict(ptree)
        for key, val in stats.items():
            if key == "act_amax":
                amax = float(np.asarray(val).max())  # sow may store a tuple
                out["act_scale"] = np.float32(max(amax * margin, 1e-6) / 127.0)
            elif isinstance(val, dict) and key in ptree:
                out[key] = write(ptree[key], val)
        return out

    new_params = params
    for method, arg in (("encode_image", pixels), ("encode_text", tokens)):
        if arg is None:
            continue
        apply = jax.jit(
            functools.partial(model.apply, method=method, mutable=["act_stats"])
        )
        _, variables = apply(new_params, arg)
        stats = jax.device_get(variables.get("act_stats", {}))
        if stats:
            new_params = {**new_params, "params": write(new_params["params"], stats)}
    return new_params


@functools.lru_cache(maxsize=32)
def _block_diag_mask_np(pack: int, seq: int, causal: bool) -> np.ndarray:
    """(1, 1, pack*seq, pack*seq) additive mask: 0 inside each sequence's
    diagonal block (upper-triangle -1e9 when causal), -1e9 across
    sequences. -1e9 instead of -inf keeps bf16 softmax NaN-free."""
    m = np.full((pack * seq, pack * seq), -1e9, np.float32)
    for i in range(pack):
        blk = np.triu(np.full((seq, seq), -1e9, np.float32), k=1) if causal else np.zeros((seq, seq), np.float32)
        m[i * seq : (i + 1) * seq, i * seq : (i + 1) * seq] = blk
    return m[None, None]


def _block_diag_mask(pack: int, seq: int, causal: bool = False):
    return jnp.asarray(_block_diag_mask_np(pack, seq, causal))


class Attention(nn.Module):
    """Multi-head self-attention with fused QKV.

    ``mask`` is an additive bias broadcastable to (B, H, L, L); None for the
    unpacked vision tower, causal for the text tower, block-diagonal when
    sequences are packed. ``causal`` routes the Pallas kernel (which
    synthesizes its own causal mask); a non-causal additive mask always
    takes the XLA path.
    """

    num_heads: int
    compute_dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    impl: str = "xla"
    causal: bool = False
    matmul_int8: bool = False
    int8_static_act: bool = False

    @nn.compact
    def __call__(self, x, mask=None, ln=None, rows=None):
        """``ln=(scale, bias)`` folds the preceding LayerNorm into the QKV
        projection (``x`` is then the RAW residual stream; see
        ln_folded_dense). ``rows``: (B, S) token indices — restrict the
        attention core + output projection to these query rows (K/V still
        span every token; exact, see ClipConfig.pool_last_block). Not
        supported under the Pallas kernel (callers pass rows=None there).
        """
        b, l, d = x.shape
        h = self.num_heads
        hd = d // h
        if ln is not None:
            assert not self.matmul_int8, "fold_ln and the int8 path are mutually exclusive"
            kernel, bias = DenseParams(3 * d, name="qkv")(d)
            qkv = ln_folded_dense(x, kernel, bias, *ln, compute_dtype=self.compute_dtype)
        elif self.matmul_int8:
            # qkv stays int8 even in the rows-restricted pooled block: its
            # input is full-length, and weight-only here measured SLOWER
            # (18.0k vs 18.3k img/s e2e — BENCH_NOTES round 4)
            qkv = QuantDense(3 * d, dtype=self.compute_dtype, static_act=self.int8_static_act, name="qkv")(x)
        else:
            qkv = nn.Dense(3 * d, dtype=self.compute_dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, h, hd)
        k = k.reshape(b, l, h, hd)
        v = v.reshape(b, l, h, hd)

        if rows is not None:
            assert self.impl != "pallas"
            q = jnp.take_along_axis(q, rows[:, :, None, None], axis=1)
            if mask is not None:
                # (1, 1, L, L) additive mask -> the selected query rows,
                # per example: (B, 1, S, L)
                mask = jnp.take(mask[0, 0], rows, axis=0)[:, None]

        if self.impl == "pallas" and (mask is None or self.causal):
            from lemon_tpu.ops.attention import flash_attention

            out = flash_attention(q, k, v, causal=self.causal)
        else:
            scale = hd ** -0.5
            logits = jnp.einsum(
                "blhd,bmhd->bhlm", q * scale, k, preferred_element_type=self.softmax_dtype
            )
            if mask is not None:
                logits = logits + mask.astype(logits.dtype)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhlm,bmhd->blhd", probs, v)

        out = out.reshape(b, q.shape[1], d)
        # rows-restricted output (the pooled last block) has M = one CLS
        # row per image — too small for the int8 dot to win, so the
        # projection runs weight-only (probe_int8_decomp, BENCH_NOTES r4)
        proj = QuantDense(
            d, dtype=self.compute_dtype, static_act=self.int8_static_act,
            weight_only=rows is not None, name="out",
        ) if self.matmul_int8 else nn.Dense(
            d, dtype=self.compute_dtype, name="out")
        return proj(out)


class TransformerBlock(nn.Module):
    num_heads: int
    quick_gelu: bool = True
    compute_dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    ln_dtype: Any = jnp.float32
    fold_ln: bool = False
    attention_impl: str = "xla"
    causal: bool = False
    matmul_int8: bool = False
    int8_static_act: bool = False

    @nn.compact
    def __call__(self, x, mask=None, rows=None):
        """``rows``: (B, S) — compute this block's output only for those
        token rows (the pooled-last-block fast path; K/V and the pre-attn
        LayerNorm still read every row)."""
        d = x.shape[-1]
        act = quick_gelu if self.quick_gelu else jax.nn.gelu

        def residual_base(full):
            if rows is None:
                return full
            return jnp.take_along_axis(full, rows[:, :, None], axis=1)

        # ln_1/ln_2 feed ONLY the following projection, so the fast path
        # folds them into the qkv/fc matmuls (ln_folded_dense) — identical
        # param tree, no materialized LN output. The parity path keeps the
        # reference op order (chexzero_clip.py:190-200).
        if self.fold_ln and self.attention_impl != "pallas":
            g1, b1 = LnParams(name="ln_1")(d)
            x = residual_base(x) + Attention(
                self.num_heads,
                compute_dtype=self.compute_dtype,
                softmax_dtype=self.softmax_dtype,
                impl=self.attention_impl,
                causal=self.causal,
                name="attn",
            )(x, mask, ln=(g1, b1), rows=rows)
            g2, b2 = LnParams(name="ln_2")(d)
            kf, bf = DenseParams(4 * d, name="mlp_fc")(d)
            y = ln_folded_dense(x, kf, bf, g2, b2, compute_dtype=self.compute_dtype)
        else:
            x = residual_base(x) + Attention(
                self.num_heads,
                compute_dtype=self.compute_dtype,
                softmax_dtype=self.softmax_dtype,
                impl=self.attention_impl,
                causal=self.causal,
                matmul_int8=self.matmul_int8,
                int8_static_act=self.int8_static_act,
                name="attn",
            )(FpLayerNorm(dtype=self.ln_dtype, name="ln_1")(x), mask, rows=rows)
            y = FpLayerNorm(dtype=self.ln_dtype, name="ln_2")(x)
            # rows-restricted blocks run the MLP on M = one CLS row per
            # image: weight-only beats the int8 dot there (BENCH_NOTES r4)
            fc = QuantDense(
                4 * d, dtype=self.compute_dtype, static_act=self.int8_static_act,
                weight_only=rows is not None, name="mlp_fc",
            ) if self.matmul_int8 else nn.Dense(
                4 * d, dtype=self.compute_dtype, name="mlp_fc")
            y = fc(y)
        y = act(y)
        proj = QuantDense(
            d, dtype=self.compute_dtype, static_act=self.int8_static_act,
            weight_only=rows is not None, name="mlp_proj",
        ) if self.matmul_int8 else nn.Dense(
            d, dtype=self.compute_dtype, name="mlp_proj")
        y = proj(y)
        return x + y


class Transformer(nn.Module):
    layers: int
    num_heads: int
    quick_gelu: bool = True
    compute_dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    ln_dtype: Any = jnp.float32
    fold_ln: bool = False
    attention_impl: str = "xla"
    causal: bool = False
    matmul_int8: bool = False
    int8_static_act: bool = False

    @nn.compact
    def __call__(self, x, mask=None, pooled_rows=None):
        """``pooled_rows``: (B, S) — the final block computes only these
        rows (ClipConfig.pool_last_block); earlier blocks are unaffected."""
        for i in range(self.layers):
            rows = pooled_rows if i == self.layers - 1 else None
            x = TransformerBlock(
                self.num_heads,
                quick_gelu=self.quick_gelu,
                compute_dtype=self.compute_dtype,
                softmax_dtype=self.softmax_dtype,
                ln_dtype=self.ln_dtype,
                fold_ln=self.fold_ln,
                attention_impl=self.attention_impl,
                causal=self.causal,
                matmul_int8=self.matmul_int8,
                int8_static_act=self.int8_static_act,
                name=f"block_{i}",
            )(x, mask, rows=rows)
        return x


class VisionTower(nn.Module):
    """ViT with class token, learned position embeddings and a final
    projection (chexzero_clip.py:226-260)."""

    cfg: ClipConfig
    compute_dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    ln_dtype: Any = jnp.float32
    fold_ln: bool = False
    pool_last_block: bool = False
    matmul_int8: bool = False
    int8_static_act: bool = False

    @nn.compact
    def __call__(self, pixels, return_tokens: bool = False):
        """``pixels``: (B, H, W, 3) NHWC, already normalized.

        ``return_tokens=True`` returns the full (B, 1+G^2, W) token states
        after the final block + LayerNorm (used as the image prefix by the
        captioner) instead of the projected CLS embedding."""
        cfg = self.cfg
        b = pixels.shape[0]
        p = cfg.vision_patch_size
        g = cfg.grid
        w = cfg.vision_width

        # Non-overlapping patch embed as reshape + matmul (MXU-friendly).
        x = pixels.astype(self.compute_dtype)
        x = x.reshape(b, g, p, g, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
        patch_kernel = self.param(
            "patch_embedding",
            nn.initializers.lecun_normal(),
            (p * p * 3, w),
            jnp.float32,
        )
        x = jnp.dot(x, patch_kernel.astype(self.compute_dtype), preferred_element_type=jnp.float32).astype(
            self.compute_dtype
        )
        if cfg.vision_patch_bias:
            patch_bias = self.param("patch_bias", nn.initializers.zeros, (w,), jnp.float32)
            x = x + patch_bias.astype(x.dtype)

        cls = self.param("class_embedding", nn.initializers.normal(w ** -0.5), (w,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, w)), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(w ** -0.5),
            (g * g + 1, w),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        if cfg.vision_ln_pre:
            x = FpLayerNorm(dtype=self.ln_dtype, name="ln_pre")(x)
        seq = g * g + 1
        pack = cfg.attention_pack if b % max(cfg.attention_pack, 1) == 0 else 1
        if cfg.attention_impl == "pallas":
            pack = 1  # the flash kernel can't consume a block-diagonal mask
        mask = None
        if pack > 1:
            x = x.reshape(b // pack, pack * seq, w)
            mask = _block_diag_mask(pack, seq)
        # Only the CLS rows survive ln_post/proj: the last block computes
        # just those rows (exact; ClipConfig.pool_last_block, gated on the
        # Precision fast path).
        pooled = (
            self.pool_last_block and cfg.pool_last_block
            and cfg.attention_impl != "pallas" and not return_tokens
        )
        rows = None
        if pooled:
            rows = jnp.broadcast_to(
                (jnp.arange(pack, dtype=jnp.int32) * seq)[None], (b // pack, pack)
            )
        x = Transformer(
            cfg.vision_layers,
            cfg.v_heads,
            quick_gelu=cfg.quick_gelu,
            compute_dtype=self.compute_dtype,
            softmax_dtype=self.softmax_dtype,
            ln_dtype=self.ln_dtype,
            fold_ln=self.fold_ln,
            attention_impl=cfg.attention_impl,
            matmul_int8=self.matmul_int8,
            int8_static_act=self.int8_static_act,
            name="transformer",
        )(x, mask, pooled_rows=rows)
        if pooled:
            x = FpLayerNorm(name="ln_post")(x.reshape(b, w))
            proj = self.param(
                "proj", nn.initializers.normal(w ** -0.5), (w, cfg.embed_dim), jnp.float32
            )
            return jnp.dot(x.astype(self.compute_dtype), proj.astype(self.compute_dtype), preferred_element_type=jnp.float32)
        if pack > 1:
            x = x.reshape(b, seq, w)
        if return_tokens:
            return FpLayerNorm(name="ln_post")(x)
        x = FpLayerNorm(name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(w ** -0.5), (w, cfg.embed_dim), jnp.float32
        )
        return jnp.dot(x.astype(self.compute_dtype), proj.astype(self.compute_dtype), preferred_element_type=jnp.float32)


class TextTower(nn.Module):
    """Causal text transformer with first-EOT pooling
    (chexzero_clip.py:355-376)."""

    cfg: ClipConfig
    compute_dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    ln_dtype: Any = jnp.float32
    fold_ln: bool = False
    pool_last_block: bool = False
    matmul_int8: bool = False
    int8_static_act: bool = False

    @nn.compact
    def __call__(self, tokens):
        cfg = self.cfg
        b, l = tokens.shape
        w = cfg.text_width
        emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, w), jnp.float32
        )
        x = jnp.take(emb, tokens, axis=0).astype(self.compute_dtype)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (cfg.context_length, w), jnp.float32
        )
        x = x + pos[:l].astype(x.dtype)

        pack = cfg.text_attention_pack if b % max(cfg.text_attention_pack, 1) == 0 else 1
        # Pallas flash attention builds its own causal mask and can't see a
        # packed block-diagonal one.
        if cfg.attention_impl == "pallas":
            pack = 1
        if pack > 1:
            x = x.reshape(b // pack, pack * l, w)
            mask = _block_diag_mask(pack, l, causal=True)
        else:
            mask = _block_diag_mask(1, l, causal=True)

        # Pool at the first EOT: ids peak at the EOT token, and argmax
        # returns the first occurrence, so this works for both zero- and
        # EOT-padded batches. With pool_last_block the final block computes
        # only these rows (exact), so the full-sequence ln_final disappears.
        eot_pos = jnp.argmax(tokens, axis=-1).astype(jnp.int32)
        do_pool = self.pool_last_block and cfg.pool_last_block_text and cfg.attention_impl != "pallas"
        rows = None
        if do_pool:
            if pack > 1:
                rows = eot_pos.reshape(b // pack, pack) + (jnp.arange(pack, dtype=jnp.int32) * l)[None]
            else:
                rows = eot_pos[:, None]

        x = Transformer(
            cfg.text_layers,
            cfg.text_heads,
            quick_gelu=cfg.quick_gelu,
            compute_dtype=self.compute_dtype,
            softmax_dtype=self.softmax_dtype,
            ln_dtype=self.ln_dtype,
            fold_ln=self.fold_ln,
            attention_impl=cfg.attention_impl,
            matmul_int8=self.matmul_int8,
            int8_static_act=self.int8_static_act,
            causal=True,
            name="transformer",
        )(x, mask, pooled_rows=rows)
        if do_pool:
            pooled = FpLayerNorm(dtype=self.ln_dtype, name="ln_final")(x.reshape(b, w))
        else:
            if pack > 1:
                x = x.reshape(b, l, w)
            x = FpLayerNorm(dtype=self.ln_dtype, name="ln_final")(x)
            pooled = x[jnp.arange(b), eot_pos]
        proj = self.param(
            "text_projection", nn.initializers.normal(w ** -0.5), (w, cfg.embed_dim), jnp.float32
        )
        return jnp.dot(pooled.astype(self.compute_dtype), proj.astype(self.compute_dtype), preferred_element_type=jnp.float32)


class ClipModel(nn.Module):
    """Two-tower CLIP with a learned temperature (chexzero_clip.py:263-392)."""

    cfg: ClipConfig
    precision: Precision = Precision()

    def setup(self):
        if self.cfg.is_resnet:
            from lemon_tpu.models.resnet import ResNetVisionTower

            assert not self.precision.matmul_int8, "int8 fast path covers the ViT towers only"
            self.visual = ResNetVisionTower(self.cfg, compute_dtype=self.precision.compute_dtype)
        else:
            self.visual = VisionTower(
                self.cfg,
                compute_dtype=self.precision.compute_dtype,
                softmax_dtype=self.precision.softmax_dtype,
                ln_dtype=self.precision.ln_dtype,
                fold_ln=self.precision.fold_ln,
                pool_last_block=self.precision.pool_last_block,
                matmul_int8=self.precision.matmul_int8,
                int8_static_act=self.precision.int8_static_act,
            )
        # int8 covers the VISION tower only: measured on v5e the text tower
        # LOSES under int8 at every batch size (L=77 unpacked, width 512:
        # 5.2k txt/s at B=96, 12.4k at B=192 vs 21.7k bf16 —
        # benchmarks/probe_int8_embed.py round 3), while the vision tower
        # gains ~25% (21.2k vs 17.0k img/s). The narrower 512-dim matmuls
        # leave the MXU int8 gain below the extra quantize/dequant work.
        self.text = TextTower(
            self.cfg,
            compute_dtype=self.precision.compute_dtype,
            softmax_dtype=self.precision.softmax_dtype,
            ln_dtype=self.precision.ln_dtype,
            fold_ln=self.precision.fold_ln,
            pool_last_block=self.precision.pool_last_block,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1 / 0.07), jnp.float32),
            (),
        )

    def encode_image(self, pixels):
        return self.visual(pixels)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, pixels, tokens):
        img = self.encode_image(pixels)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def init_params(cfg: ClipConfig, seed: int = 0, precision: Precision = Precision()):
    model = ClipModel(cfg, precision=precision)
    # int8 models initialize through their fp32 twin (QuantDense's own init
    # is all-zero kernels — meaningless weights); the standard tree then
    # quantizes exactly like a loaded checkpoint would, so random-init
    # benchmarking exercises the real path.
    init_model = (
        ClipModel(cfg, precision=dataclasses.replace(precision, matmul_int8=False))
        if precision.matmul_int8 else model
    )
    pixels = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32)
    tokens = jnp.zeros((1, cfg.context_length), jnp.int32)
    # jit the init: un-jitted tracing dispatches every initializer as its
    # own device op — hundreds of RPC round-trips on a tunneled TPU.
    init_fn = jax.jit(init_model.init)
    params = init_fn(jax.random.PRNGKey(seed), pixels, tokens)
    # NOTE: the returned tree is the STANDARD layout either way; ClipEncoder
    # quantizes it once at build (models/encoder.py).
    return model, params
