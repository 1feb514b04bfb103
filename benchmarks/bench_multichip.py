"""Multi-chip scaling benchmark: DP embedding + mesh-sharded exact kNN.

Ready to run the moment multi-chip hardware is attached (ROADMAP item 13 /
SURVEY §2c): measures per-chip embedding throughput under data-parallel
sharding and sharded-kNN pairs/s with the all-gather top-k merge, for each
mesh width up to the device count. Until then, `--platform cpu --tiny`
validates the full measurement path on the virtual 8-device CPU mesh
(numbers are meaningless on CPU; the point is that the sharded programs
compile and execute).

    python benchmarks/bench_multichip.py                # real chips
    python benchmarks/bench_multichip.py --platform cpu --tiny --devices 8

Prints one JSON line per mesh width:
  {"devices": N, "embed_img_per_sec": ..., "knn_pairs_per_sec": ...}
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=0, help="0 = all available")
    p.add_argument("--platform", default=None, help="force jax platform (cpu for the virtual mesh)")
    p.add_argument("--tiny", action="store_true", help="toy sizes (CPU validation mode)")
    p.add_argument("--batch_per_chip", type=int, default=128)
    p.add_argument("--db_per_chip", type=int, default=65536)
    p.add_argument("--queries", type=int, default=8192)
    p.add_argument("--k", type=int, default=51)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import os

        # append (not setdefault): a pre-set XLA_FLAGS must not silently
        # drop the virtual-device flag
        flag = f"--xla_force_host_platform_device_count={args.devices or 8}"
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from lemon_tpu.core.mesh import get_mesh
    from lemon_tpu.core.precision import Precision
    from lemon_tpu.knn.index import ExactKnnIndex
    from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params
    from lemon_tpu.models.encoder import ClipEncoder

    n_avail = len(jax.devices())
    n_devices = args.devices or n_avail
    assert n_devices <= n_avail, (n_devices, n_avail)

    if args.tiny:
        cfg = ClipConfig.tiny()
        args.batch_per_chip, args.db_per_chip, args.queries, args.k = 8, 512, 64, 3
    else:
        cfg = ClipConfig.vit_b32()
    model, params = init_params(cfg, seed=0, precision=Precision.bf16())

    rng = np.random.default_rng(0)
    # Timing note: encode_images/search return numpy, which forces device
    # execution — no separate scalar-fetch wrapper is needed here.

    widths = []
    w = 1
    while w <= n_devices:
        widths.append(w)
        w *= 2
    if widths[-1] != n_devices:
        widths.append(n_devices)

    for width in widths:
        mesh = get_mesh(width, 1) if width > 1 else None

        # --- DP embedding ---------------------------------------------------
        enc = ClipEncoder(model, params, mesh=mesh, batch_size=args.batch_per_chip * width)
        b = args.batch_per_chip * width
        images = rng.integers(0, 256, (b, cfg.image_resolution, cfg.image_resolution, 3), np.uint8)
        steps = 3 if args.tiny else 10
        enc.encode_images(images)  # compile
        t0 = time.perf_counter()
        for _ in range(steps):
            enc.encode_images(images)
        embed_rate = b * steps / (time.perf_counter() - t0)

        # --- sharded exact kNN ---------------------------------------------
        n_db = args.db_per_chip * width
        xb = rng.standard_normal((n_db, 64 if args.tiny else 512)).astype(np.float32)
        xq = rng.standard_normal((args.queries, xb.shape[1])).astype(np.float32)
        index = ExactKnnIndex(metric="ip", mesh=mesh)
        index.add(xb)
        # Warm with the FULL query shape: the search program (and its
        # auto_tile static arg) is keyed on it, so a small-query warmup
        # would leave the real compile inside the timed region.
        index.search(xq, k=args.k)
        t0 = time.perf_counter()
        index.search(xq, k=args.k)
        knn_rate = n_db * args.queries / (time.perf_counter() - t0)

        # --- train step: DP, and dp×tp2 when the width is even --------------
        from lemon_tpu.train.contrastive import (
            TrainConfig,
            create_train_state,
            make_train_step,
            shard_train_batch,
        )

        def train_rate(mesh_t):
            tcfg = TrainConfig(
                batch_size=args.batch_per_chip * width,
                warmup_steps=1, total_steps=10,
                precision="bf16" if not args.tiny else "fp32",
            )
            m, state = create_train_state(cfg, tcfg, mesh=mesh_t)
            step = make_train_step(m, mesh=mesh_t, state=state)
            px = rng.standard_normal((tcfg.batch_size, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32)
            tk = rng.integers(1, cfg.vocab_size - 2, (tcfg.batch_size, cfg.context_length)).astype(np.int32)
            tk[:, -1] = cfg.vocab_size - 1
            if mesh_t is not None:
                px, tk = shard_train_batch(mesh_t, px, tk)
            else:
                px, tk = jnp.asarray(px), jnp.asarray(tk)
            state, loss = step(state, px, tk)  # compile
            float(loss)
            steps_t = 2 if args.tiny else 5
            t0 = time.perf_counter()
            for _ in range(steps_t):
                state, loss = step(state, px, tk)
            float(loss)
            return tcfg.batch_size * steps_t / (time.perf_counter() - t0)

        train_dp = train_rate(mesh)
        train_tp = None
        if width >= 2 and width % 2 == 0:
            train_tp = train_rate(get_mesh(width // 2, 2))

        print(json.dumps({
            "devices": width,
            "embed_img_per_sec": round(embed_rate, 1),
            "embed_img_per_sec_per_chip": round(embed_rate / width, 1),
            "knn_pairs_per_sec": round(knn_rate, 0),
            "knn_pairs_per_sec_per_chip": round(knn_rate / width, 0),
            "train_pairs_per_sec_dp": round(train_dp, 1),
            "train_pairs_per_sec_dp_tp2": round(train_tp, 1) if train_tp is not None else None,
        }), flush=True)


if __name__ == "__main__":
    main()
