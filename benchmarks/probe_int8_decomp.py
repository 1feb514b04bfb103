"""int8_static embed-pipeline decomposition (round 4, verdict item 3).

Round 3 measured the 12-block MATMUL stack at 3.64 ms int8-static vs
6.29 bf16 (1.7x, probe_int8_static) but the shipped end-to-end mode at
only ~1.15x (19.4k vs 16.9k img/s). This probe decomposes the ACTUAL
int8_static pipeline at the shipped batch (B=128, pack=2) the same way
probe_attn_core decomposed the bf16 one, so every residual millisecond
has an owner:

  full_{bf16,int8s}      - uint8 -> normalized embedding (the bench leg)
  pp_only                - on-device resize/normalize alone
  tower_{bf16,int8s}     - encode_image on fixed preprocessed pixels
                           (= full minus preprocess minus scan glue)
  stack_{bf16,int8s}     - 12 packed transformer blocks incl. attention
                           core (PackedStack twin of the shipped tower
                           inner; last block NOT pooled — the real tower
                           pools it, so tower-vs-stack comparisons carry
                           a ~+0.4 ms stack bias at bf16)
  stack_attn_int8s       - qkv + core + out only
  stack_mlp_int8s        - fc + gelu + proj only
  stack_int8s_nocore     - full block structure, attention core elided
                           (the probe_int8_static environment): isolates
                           the quantize-epilogue + matmul load from the
                           (unquantized) core

Derived rows (printed): head+patch-embed glue = tower - stack;
dispatch/scan glue = full - pp - tower; attention core share; the int8
residual vs the 330-TOPS projection roofline.

Run: python benchmarks/probe_int8_decomp.py   (one TPU process at a time!)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks.probe_attn_core import (  # noqa: E402
    B,
    D,
    H,
    L,
    LP,
    PACK,
    ROWS,
    scan_runner,
    two_point,
)

from lemon_tpu.core.precision import Precision  # noqa: E402
from lemon_tpu.models.clip import (  # noqa: E402
    Attention,
    ClipConfig,
    ClipModel,
    FpLayerNorm,
    QuantDense,
    _block_diag_mask,
    calibrate_act_scales,
    init_params,
    quantize_clip_params,
)
from lemon_tpu.ops.image import preprocess_device  # noqa: E402


class Stack(nn.Module):
    """Shipped tower inner (12 packed blocks) with the quantization mode
    as a knob. ``quant='static'`` is the shipped int8_static block: the
    four projections are QuantDense(static_act=True); LN, softmax,
    attention core and residuals stay bf16/fp32 exactly like the model."""

    mode: str = "full"      # full | attn | mlp | nocore
    quant: str = "off"      # off | static

    @nn.compact
    def __call__(self, x):
        int8 = self.quant == "static"
        static = int8
        mask = _block_diag_mask(PACK, L, causal=False)
        mk = (
            (lambda f, name: QuantDense(f, dtype=jnp.bfloat16, static_act=static, name=name))
            if int8
            else (lambda f, name: nn.Dense(f, dtype=jnp.bfloat16, name=name))
        )
        for i in range(12):
            if self.mode in ("full", "attn"):
                x = x + Attention(
                    H, compute_dtype=jnp.bfloat16, softmax_dtype=jnp.bfloat16,
                    matmul_int8=int8, int8_static_act=static, name=f"attn_{i}"
                )(FpLayerNorm(name=f"ln1_{i}")(x), mask)
            elif self.mode == "nocore":
                h = FpLayerNorm(name=f"ln1_{i}")(x)
                qkv = mk(3 * D, f"qkv_{i}")(h)
                x = x + mk(D, f"out_{i}")(qkv[..., :D])  # q slice stands in
            if self.mode in ("full", "mlp", "nocore"):
                y = FpLayerNorm(name=f"ln2_{i}")(x)
                y = mk(4 * D, f"fc_{i}")(y)
                y = y * jax.nn.sigmoid(1.702 * y)
                x = x + mk(D, f"proj_{i}")(y)
        return x


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    results = {}
    images = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), np.uint8))
    cfg = ClipConfig.vit_b32()

    pp = jax.jit(lambda im: preprocess_device(im, size=224, pil_rounding=False, precision="default"))
    pixels = jax.block_until_ready(pp(images))

    towers = {}
    for tag, precision in (("bf16", Precision.bf16()), ("int8s", Precision.int8_static())):
        model, params = init_params(cfg, seed=0, precision=precision)
        if precision.matmul_int8:
            from lemon_tpu.models.clip import quantize_clip_params_jit

            params = quantize_clip_params_jit(params, static_act=True)
            params = calibrate_act_scales(model, params, pixels=pixels)
        towers[tag] = (model, params)

        def full_apply(p, imgs, model=model):
            px = preprocess_device(imgs, size=224, pil_rounding=False, precision="default")
            emb = model.apply(p, px, method=ClipModel.encode_image)
            return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        per = two_point(scan_runner(full_apply), params, images)
        results[f"full_{tag}_ms"] = round(per * 1e3, 3)
        print(f"full_{tag}: {per * 1e3:.2f} ms = {B / per:.0f} img/s", flush=True)

    # preprocess alone (scan over the same runner for comparability)
    per = two_point(scan_runner(lambda p, im: preprocess_device(
        im, size=224, pil_rounding=False, precision="default")), {}, images)
    results["pp_only_ms"] = round(per * 1e3, 3)
    print(f"pp_only: {per * 1e3:.2f} ms", flush=True)

    # tower on fixed pixels
    for tag, (model, params) in towers.items():
        def tower_apply(p, px, model=model):
            emb = model.apply(p, px, method=ClipModel.encode_image)
            return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        per = two_point(scan_runner(tower_apply), params, pixels)
        results[f"tower_{tag}_ms"] = round(per * 1e3, 3)
        print(f"tower_{tag}: {per * 1e3:.2f} ms", flush=True)

    # stacks
    x = jnp.asarray(rng.standard_normal((ROWS, LP, D)) * 0.1, jnp.bfloat16)
    for tag, mode, quant in (
        ("stack_bf16", "full", "off"),
        ("stack_int8s", "full", "static"),
        ("stack_attn_int8s", "attn", "static"),
        ("stack_mlp_int8s", "mlp", "static"),
        ("stack_int8s_nocore", "nocore", "static"),
    ):
        m = Stack(mode=mode, quant=quant)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        if quant == "static":
            p = quantize_clip_params(p, static_act=True)
        per = two_point(scan_runner(lambda pp_, xx, m=m: m.apply(pp_, xx)), p, x)
        results[tag + "_ms"] = round(per * 1e3, 3)
        print(f"{tag}: {per * 1e3:.2f} ms", flush=True)

    # derived rows
    d = results
    print("-- derived --", flush=True)
    for tag in ("bf16", "int8s"):
        glue = d[f"full_{tag}_ms"] - d["pp_only_ms"] - d[f"tower_{tag}_ms"]
        head = d[f"tower_{tag}_ms"] - d[f"stack_{tag}_ms"]
        print(f"{tag}: dispatch/scan glue {glue:.2f} ms; head+patch-embed-(pooled-bias) {head:.2f} ms", flush=True)
        d[f"glue_{tag}_ms"] = round(glue, 3)
        d[f"head_{tag}_ms"] = round(head, 3)
    core = d["stack_int8s_ms"] - d["stack_int8s_nocore_ms"]
    print(f"attention core (incl. softmax) inside int8s stack: ~{core:.2f} ms", flush=True)
    d["core_in_stack_int8s_ms"] = round(core, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
