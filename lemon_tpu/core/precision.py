"""Precision policy.

The reference runs everything in fp32 (fp16 only via the chexzero
``convert_weights`` path, /root/reference/lib/models/chexzero_clip.py:395-416).
On TPU the natural fast path is bfloat16 compute with fp32 accumulation on the
MXU; fp32 end-to-end is the parity mode (AUROC-within-0.001 acceptance is
defined against fp32 reference numerics).
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Compute/parameter/output dtypes for the model stack."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # LayerNorm always runs in fp32 regardless of compute dtype, matching the
    # fp16-safe LayerNorm semantics of CLIP (chexzero_clip.py:177-183).
    ln_dtype: jnp.dtype = jnp.float32
    # Attention logits/softmax dtype. fp32 is the parity default; the bf16
    # fast path keeps the whole softmax in bf16 (measured -16% attention
    # stack time on v5e, BENCH_NOTES round 2; max-subtracted softmax is
    # bf16-stable at CLIP's logit scales).
    softmax_dtype: jnp.dtype = jnp.float32
    # Fold ln_1/ln_2 into the following qkv/fc matmuls (models/clip.py
    # ln_folded_dense): algebraically exact, removes LN's materialized
    # output. Off on the parity path to keep the reference op order.
    fold_ln: bool = False
    # Run each tower's LAST transformer block only on the pooled row
    # (vision CLS / text first-EOT) — mathematically exact per row
    # (models/clip.py ClipConfig.pool_last_block) and measured +20% embed
    # throughput on v5e (16.2k vs 13.5k img/s same-conditions A/B). Off on
    # the parity path: restricting the row set changes BLAS blocking and
    # so float-level summation order, which flips near-tied kNN ranks —
    # the fp32 acceptance bar (AUROC within 0.001 of the reference,
    # SURVEY §6) requires the reference's exact numerics.
    pool_last_block: bool = False
    # W8A8 dynamic-quantized projections (qkv/attn-out/mlp) through XLA's
    # native int8 dot_general — measured 318-355 TOPS vs 163-202 bf16 at
    # the ViT shapes on v5e (benchmarks/probe_pallas_int8.py, chained
    # DCE-proof harness). Per-output-channel weight scales quantized ONCE
    # at encoder build (models/clip.py quantize_clip_params); per-token
    # activation scales computed on the fly. Attention core, LN, softmax
    # and the towers' heads stay in compute_dtype. Opt-in fast mode: the
    # quantization error is measured, not assumed (tests/test_int8.py +
    # BENCH_NOTES AUROC drift).
    matmul_int8: bool = False
    # Static per-layer activation scales for the int8 path (only meaningful
    # with matmul_int8): the per-token dynamic amax reduce is an extra VPU
    # pass per projection that XLA cannot fuse through the dot; a calibrated
    # scalar turns the quantize into a multiply+round that fuses into the
    # preceding LN/GELU epilogue (measured 3.64 vs 4.55 ms dynamic on the
    # 12-block matmul stack, benchmarks/probe_int8_static.py). Scales are
    # calibrated lazily on the encoder's first batch
    # (models/clip.py calibrate_act_scales).
    #
    # Calibration-batch contract: every quantized projection sits behind a
    # LayerNorm (qkv, mlp_fc) or a GELU of LN'd input (attn-out, mlp_proj),
    # so activation ranges are normalization-bounded and nearly
    # input-independent — that is WHY one static scalar per layer works.
    # Consequence: ANY batch of preprocessed pixels is an acceptable
    # calibration batch, including pathological ones. Measured
    # (tests/test_int8.py::test_int8_static_calibration_robust_to_degenerate_batch):
    # calibrating on all-black, all-white, or max-contrast binary images
    # keeps per-layer scales within ~2x of real-batch scales and tower
    # cosine alignment vs fp32 above the same floor as real-batch
    # calibration. No fallback path is needed; the failure mode the test
    # guards is a future layer being quantized WITHOUT a normalizer in
    # front of it.
    int8_static_act: bool = False

    @staticmethod
    def fp32() -> "Precision":
        return Precision()

    @staticmethod
    def bf16() -> "Precision":
        return Precision(
            param_dtype=jnp.float32,
            compute_dtype=jnp.bfloat16,
            softmax_dtype=jnp.bfloat16,
            # Both LN variants measured flat-to-negative at B=128 packed on
            # v5e (bf16 LN tail 15.5k, fold_ln 15.1k vs 15.5k baseline):
            # XLA already fuses LN into adjacent ops, so LN is off the
            # critical path. Keep fp32 LN + standard op order; the knobs
            # stay for other shapes/hardware.
            ln_dtype=jnp.float32,
            fold_ln=False,
            pool_last_block=True,
        )


    @staticmethod
    def int8() -> "Precision":
        """bf16 fast path + W8A8 projections (see ``matmul_int8``)."""
        return dataclasses.replace(Precision.bf16(), matmul_int8=True)

    @staticmethod
    def int8_static() -> "Precision":
        """int8 + calibrated static activation scales (``int8_static_act``)."""
        return dataclasses.replace(Precision.int8(), int8_static_act=True)


def default_precision() -> Precision:
    mode = os.environ.get("LEMON_TPU_PRECISION", "fp32").lower()
    if mode == "int8":
        return Precision.int8()
    if mode == "int8_static":
        return Precision.int8_static()
    return Precision.bf16() if mode in ("bf16", "bfloat16") else Precision.fp32()
