"""Is pool_last_block a WIN under int8_static? (round 4)

The decomposition (probe_int8_decomp) shows the pooled last block at
int8_static costs MORE than a full int8 block even after the round-4
weight-only fix (head_int8s 0.94 ms vs head_bf16 0.24 at identical
unquantized head code), while at bf16 pooling measured +20% isolated
(round 2). If the pooled int8 block is net-negative, the cheapest fix is
to not pool under int8. This probe times the FULL int8_static pipeline
(uint8 -> unit embedding, the bench leg) with pooling on vs off, plus
the bf16 control pair, all in one process/session.

Run: python benchmarks/probe_int8_pool.py   (one TPU process at a time!)
"""

from __future__ import annotations

import dataclasses as dc
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks.probe_attn_core import B, scan_runner, two_point  # noqa: E402

from lemon_tpu.core.precision import Precision  # noqa: E402
from lemon_tpu.models.clip import (  # noqa: E402
    ClipConfig,
    ClipModel,
    calibrate_act_scales,
    init_params,
    quantize_clip_params_jit,
)
from lemon_tpu.ops.image import preprocess_device  # noqa: E402


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), np.uint8))
    cfg = ClipConfig.vit_b32()
    pp = jax.jit(lambda im: preprocess_device(im, size=224, pil_rounding=False, precision="default"))
    pixels = jax.block_until_ready(pp(images))

    results = {}
    for tag, precision in (
        ("int8s_pooled", Precision.int8_static()),
        ("int8s_unpooled", dc.replace(Precision.int8_static(), pool_last_block=False)),
        ("bf16_pooled", Precision.bf16()),
        ("bf16_unpooled", dc.replace(Precision.bf16(), pool_last_block=False)),
    ):
        model, params = init_params(cfg, seed=0, precision=precision)
        if precision.matmul_int8:
            params = quantize_clip_params_jit(params, static_act=True)
            params = calibrate_act_scales(model, params, pixels=pixels)

        def full_apply(p, imgs, model=model):
            px = preprocess_device(imgs, size=224, pil_rounding=False, precision="default")
            emb = model.apply(p, px, method=ClipModel.encode_image)
            return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        per = two_point(scan_runner(full_apply), params, images)
        results[f"{tag}_ms"] = round(per * 1e3, 3)
        print(f"{tag}: {per * 1e3:.2f} ms = {B / per:.0f} img/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
