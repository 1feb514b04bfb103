"""Trainer step-time decomposition (ROADMAP #15).

Splits the bf16 contrastive training step (the train_clip_from_scratch.py
:153-187 hot loop analog) into its cost components on the real chip:

  - forward-only loss
  - fwd+bwd (value_and_grad, no optimizer)
  - full step (fwd+bwd+AdamW apply_gradients)
  - per-tower fwd+bwd (image only / text only, sum-of-features loss)
  - attention_pack {1,2} x batch {256,512} sweep on the full step

FLOPs model for reference (ViT-B/32 + 77-ctx text tower):
  image fwd ~8.7 GFLOPs/img, text fwd ~5.8 GFLOPs/caption,
  train step ~3x fwd = ~43.6 GFLOPs/pair -> v5e bf16 peak (197T) gives
  ~4.5k pairs/s at 100% MFU.

Usage: python -m benchmarks.probe_train [--batch 256] [--precision bf16]
"""

from __future__ import annotations

import argparse
import functools
import json

import numpy as np

from benchmarks._timing import timed_scalar


def make_inputs(cfg, batch_size):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((batch_size, 224, 224, 3)).astype(np.float32))
    tokens = rng.integers(1, cfg.vocab_size - 2, (batch_size, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1
    return pixels, jnp.asarray(tokens)


def two_point(fn, state, pixels, tokens, s_small=1, s_large=5, reps=2):
    timed_scalar(fn, state, pixels, tokens, s_small)
    timed_scalar(fn, state, pixels, tokens, s_large)
    t_s = min(timed_scalar(fn, state, pixels, tokens, s_small) for _ in range(reps))
    t_l = min(timed_scalar(fn, state, pixels, tokens, s_large) for _ in range(reps))
    return max(t_l - t_s, 1e-9) / (s_large - s_small)


def build_variants(model, precision):
    """Return dict of scanned jitted programs keyed by variant name."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.models.clip import ClipModel
    from lemon_tpu.train.contrastive import clip_loss

    def scanned(body):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def run(state, pixels, tokens, steps):
            def f(st, step):
                return body(st, jnp.roll(pixels, step, 0), jnp.roll(tokens, step, 0))

            final, losses = jax.lax.scan(f, state, jnp.arange(steps))
            return jnp.sum(losses)

        return run

    def loss_fn_of(pixels, tokens):
        def loss_fn(params):
            li, lt = model.apply(params, pixels, tokens)
            return clip_loss(li, lt)

        return loss_fn

    def consume(tree):
        """Reduce every leaf so no part of the backward can be DCE'd.

        Summing a single leaf is NOT enough: the first leaf is
        logit_scale, whose gradient needs no tower backward at all, so
        XLA eliminates the whole thing and 'grad_only' times as fwd_only.
        """
        return sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree_util.tree_leaves(tree))

    def full_step(st, pixels, tokens):
        loss, grads = jax.value_and_grad(loss_fn_of(pixels, tokens))(st.params)
        return st.apply_gradients(grads=grads), loss

    def grad_only(st, pixels, tokens):
        loss, grads = jax.value_and_grad(loss_fn_of(pixels, tokens))(st.params)
        return st, loss + consume(grads) * 0

    def opt_only(st, pixels, tokens):
        # params-shaped fake grads: isolates the AdamW apply cost.
        # Grads derive from pixels so the update can't constant-fold.
        seed = pixels[0, 0, 0, 0]
        grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e-6) * seed, st.params)
        new = st.apply_gradients(grads=grads)
        return new, consume(new.params) * 1e-20

    def fwd_only(st, pixels, tokens):
        return st, loss_fn_of(pixels, tokens)(st.params)

    def image_fwdbwd(st, pixels, tokens):
        def lf(params):
            emb = model.apply(params, pixels, method=ClipModel.encode_image)
            return jnp.sum(emb.astype(jnp.float32) ** 2) / emb.shape[0]

        loss, grads = jax.value_and_grad(lf)(st.params)
        return st, loss + consume(grads) * 0

    def text_fwdbwd(st, pixels, tokens):
        def lf(params):
            emb = model.apply(params, tokens, method=ClipModel.encode_text)
            return jnp.sum(emb.astype(jnp.float32) ** 2) / emb.shape[0]

        loss, grads = jax.value_and_grad(lf)(st.params)
        return st, loss + consume(grads) * 0

    return {
        "full_step": scanned(full_step),
        "grad_only": scanned(grad_only),
        "opt_only": scanned(opt_only),
        "fwd_only": scanned(fwd_only),
        "image_fwdbwd": scanned(image_fwdbwd),
        "text_fwdbwd": scanned(text_fwdbwd),
    }


def probe_fused_adamw_floor(params, batch):
    """Handwritten single-pass AdamW over the param leaves (no optax):
    measures the hardware floor for the optimizer apply. Carry is
    (params, mu, nu, t); grads are synthesized from a scalar so the
    update chain can't constant-fold."""
    import jax
    import jax.numpy as jnp

    b1, b2, eps, wd, lr = 0.9, 0.999, 1e-8, 0.05, 1e-4
    leaves, treedef = jax.tree_util.tree_flatten(params)
    mu = [jnp.zeros_like(l) for l in leaves]
    nu = [jnp.zeros_like(l) for l in leaves]

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(leaves, mu, nu, seed, steps):
        def f(carry, step):
            ps, ms, vs, t = carry
            t = t + 1
            bc1 = 1 - b1**t
            bc2 = 1 - b2**t
            new_p, new_m, new_v = [], [], []
            for p, m, v in zip(ps, ms, vs):
                g = jnp.full_like(p, 1e-6) * seed
                m2 = b1 * m + (1 - b1) * g
                v2 = b2 * v + (1 - b2) * g * g
                u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps) + wd * p
                new_p.append(p - lr * u)
                new_m.append(m2)
                new_v.append(v2)
            return (new_p, new_m, new_v, t), jnp.float32(0)

        (ps, ms, vs, _), _ = jax.lax.scan(f, (leaves, mu, nu, jnp.float32(0)), jnp.arange(steps))
        return sum(jnp.sum(p).astype(jnp.float32) for p in ps) * 1e-20

    def fn(_state, _pixels, _tokens, steps):
        return run(leaves, mu, nu, jnp.float32(1.0), steps)

    sec = two_point(fn, None, None, None)
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--sweep", action="store_true", help="pack x batch sweep on full_step")
    ap.add_argument("--fused-opt", action="store_true", help="optax.flatten optimizer")
    args = ap.parse_args()

    import jax

    from lemon_tpu.models.clip import ClipConfig
    from lemon_tpu.train.contrastive import TrainConfig, create_train_state

    print("backend:", jax.default_backend())
    out = {}

    cfg = ClipConfig.vit_b32()
    tcfg = TrainConfig(precision=args.precision, fused_optimizer=args.fused_opt)
    model, state = create_train_state(cfg, tcfg)
    pixels, tokens = make_inputs(cfg, args.batch)
    variants = build_variants(model, args.precision)
    for name, fn in variants.items():
        sec = two_point(fn, state, pixels, tokens)
        out[name + "_ms"] = round(sec * 1e3, 2)
        out[name + "_pairs_per_s"] = round(args.batch / sec, 1)
        print(f"{name:14s}: {sec*1e3:8.2f} ms/step  {args.batch/sec:8.1f} pairs/s")

    sec = probe_fused_adamw_floor(state.params, args.batch)
    out["fused_adamw_floor_ms"] = round(sec * 1e3, 2)
    print(f"fused_adamw_floor: {sec*1e3:8.2f} ms/step")

    if args.sweep:
        import dataclasses

        # free the base-run state before the sweep; each iteration's
        # state (+AdamW moments) is ~1.8GB and accumulating them OOMs
        del state
        for pack in (1, 2):
            for batch in (256, 512):
                c = dataclasses.replace(cfg, attention_pack=pack)
                m, st = create_train_state(c, tcfg)
                px, tk = make_inputs(c, batch)
                fn = build_variants(m, args.precision)["full_step"]
                sec = two_point(fn, st, px, tk, s_small=1, s_large=4)
                key = f"full_pack{pack}_b{batch}"
                out[key + "_pairs_per_s"] = round(batch / sec, 1)
                print(f"{key:20s}: {sec*1e3:8.2f} ms/step  {batch/sec:8.1f} pairs/s")
                del m, st, fn, px, tk

    print(json.dumps(out))


if __name__ == "__main__":
    main()
