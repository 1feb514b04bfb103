"""Full-pipeline A/B of the static-act int8 mode vs dynamic int8 vs bf16.

The 12-block matmul-stack probe (probe_int8_static.py) measured static
activation scales at 3.64 ms vs 4.55 dynamic vs 6.29 bf16; this probe
checks how much of that survives the real tower (preprocess + patch embed
+ attention cores + heads), at the embed batch sizes that matter.

Run: python benchmarks/probe_int8_static_e2e.py  (one TPU process at a time!)
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
from lemon_tpu.models.clip import (  # noqa: E402
    ClipConfig,
    ClipModel,
    calibrate_act_scales,
    init_params,
    quantize_clip_params_jit,
)
from lemon_tpu.ops.image import preprocess_device  # noqa: E402


def embed_rate(precision: Precision, batch_size: int, steps=(2, 42), text=False) -> float:
    cfg = ClipConfig.vit_b32()
    print(f"  [init b={batch_size} static={precision.int8_static_act}]", flush=True)
    model, params = init_params(cfg, seed=0, precision=precision)
    print("  [init done]", flush=True)
    if precision.matmul_int8:
        params = quantize_clip_params_jit(params, static_act=precision.int8_static_act)
    rng = np.random.default_rng(0)
    if text:
        data = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch_size, 77)), jnp.int32)
        method = ClipModel.encode_text
        prep = lambda x: x
    else:
        data = jnp.asarray(rng.integers(0, 256, (batch_size, 256, 256, 3), np.uint8))
        method = ClipModel.encode_image
        prep = lambda x: preprocess_device(x, size=224, pil_rounding=False, precision="default")

    if precision.int8_static_act:
        print("  [calibrating]", flush=True)
        params = calibrate_act_scales(
            model,
            params,
            pixels=None if text else jax.jit(prep)(data),
            tokens=data if text else None,
        )
        print("  [calibrated]", flush=True)

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(params, data, steps):
        def body(carry, step):
            shifted = jnp.roll(data, step, axis=0)
            emb = model.apply(params, prep(shifted), method=method)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return carry + jnp.sum(emb.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return total

    for s in steps:
        print(f"  [compile steps={s}]", flush=True)
        timed_scalar(run, params, data, s)
    print("  [measuring]", flush=True)
    t_small = min(timed_scalar(run, params, data, steps[0]) for _ in range(3))
    t_large = min(timed_scalar(run, params, data, steps[1]) for _ in range(3))
    return batch_size * (steps[1] - steps[0]) / max(t_large - t_small, 1e-9)


def main():
    # int8 is vision-only (the text tower measured slower under int8 at
    # every batch size — probe_int8_embed round 3), so only image variants
    # are probed; dynamic-int8 B=128/192 reference numbers are 21,175 /
    # 21,289 img/s from the exclusive-access sweep.
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    for name, prec in (
        ("int8stat", Precision.int8_static()),
        ("int8dyn", Precision.int8()),
    ):
        for b in (128, 192):
            rate = embed_rate(prec, b)
            results[f"img_{name}_b{b}"] = round(rate)
            print(f"image {name:9s} B={b:4d}: {rate:9.0f} img/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
