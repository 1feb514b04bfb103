"""Benchmark: CLIP ViT-B/32 embedding + exact-kNN + train + e2e detection
throughput on the local accelerator. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Round-5 structure — SURVIVAL-FIRST scheduling. Rounds 3 and 4 both
recorded zero driver-side numbers: r3 died at the driver timeout
(rc 124) and r4's plan burned 1255 s on four consecutive leg timeouts
in a relay stall wave (single server-side compiles measured at
315–513 s, above every per-leg cap; a KILLED compile does not persist
server-side, so same-cap retries abandon the same compile twice).
Arithmetic: in a stall wave a 1260 s budget admits at most TWO fresh
compiles, so a plan that attempts four legs before securing one result
is guaranteed zero. The fix:

1. The HEADLINE leg (image bf16 + text, merged into one subprocess to
   amortize the ~11–20 s import/backend handshake) runs FIRST with a
   cap sized to the worst measured stall-wave compile (640 s > 513 s).
2. If it times out, the parent retries the SAME leg immediately with
   ALL remaining budget — not a shared slice, and no other leg runs
   before the headline number exists. Completed server-side compiles
   persist across attempts, so attempt 2 resumes where attempt 1's
   finished compiles left off.
3. Retried legs SKIP sub-measurements already captured (the parent
   passes the have-keys via LEMON_BENCH_HAVE), so a retry of the merged
   leg jumps straight to the missing part.
4. Only after the headline number lands do surplus legs run, cheapest
   compile first, each under its own cap; then one shared-budget retry
   pass over whatever failed.

A thin HOST-ONLY parent process (no jax import, so it never blocks on
the TPU relay) runs each workload as a subprocess leg under BOTH a
global wall-clock budget (LEMON_BENCH_BUDGET_S, default 1260 s) and a
per-leg timeout. Legs run serially (the relay tolerates one client at a
time — BENCH_NOTES) and print cumulative JSON after every completed
sub-measurement, so a leg killed mid-flight still contributes everything
it finished. The parent merges whatever it got and ALWAYS prints the
final JSON line — on leg failure, on budget exhaustion, and (via
SIGTERM/SIGINT handler) even when an outer driver timeout fires first.
A hung relay call can therefore cost at most one leg's timeout, never
the whole bench.

Measurement notes (tunneled-TPU-safe): dispatch timing lies on the axon
remote platform (block_until_ready returns before execution) and bulk host
fetches crawl through the tunnel, so each workload runs as ONE jitted
program whose steps all feed a scalar output; the scalar fetch forces
execution. Throughput uses a two-point measurement (small vs large step
count) to cancel constant dispatch/fetch overhead.

vs_baseline is measured against BASELINE.json's stated target of 50k
ViT-B/32 embeddings/sec/chip (the reference publishes no absolute numbers;
SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np


_T0 = time.time()


def _note(msg: str) -> None:
    """Timestamped stderr phase note: legs run under hard caps, so when one
    times out the last note says which relay call ate the budget."""
    print(f"[leg +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _timed_scalar(fn, *args) -> float:
    t0 = time.perf_counter()
    out = float(fn(*args))
    assert np.isfinite(out)
    return time.perf_counter() - t0


# ---------------------------------------------------------------------------
# workload functions (run inside leg subprocesses)


def bench_embeddings(batch_size: int = 128, steps_small: int = 2, steps_large: int = 42, mode: str = "bf16") -> float:
    """batch 128 + attention packing measured fastest on v5e for bf16
    (15.8k img/s; 256 -> 13.9k, 512 -> 11.3k; BENCH_NOTES round 2).
    ``mode='int8_static'`` measures the calibrated W8A8 vision fast path
    (vision-only; text measured slower under int8 at every batch —
    BENCH_NOTES round 3); its AUROC drift vs bf16/fp32 is recorded in
    BENCH_NOTES, and the fp32 parity path is untouched."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import (
        ClipConfig,
        ClipModel,
        calibrate_act_scales,
        init_params,
        quantize_clip_params_jit,
    )
    from lemon_tpu.ops.image import preprocess_device

    cfg = ClipConfig.vit_b32()
    precision = Precision.int8_static() if mode == "int8_static" else Precision.bf16()
    _note(f"embed[{mode}]: init_params")
    model, params = init_params(cfg, seed=0, precision=precision)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch_size, 256, 256, 3), np.uint8))
    if precision.matmul_int8:
        _note(f"embed[{mode}]: quantize params")
        params = quantize_clip_params_jit(params, static_act=precision.int8_static_act)
        if precision.int8_static_act:
            # jitted prep: eager ops through the tunnel each pay a compile
            _note(f"embed[{mode}]: calibrate act scales")
            pixels = jax.jit(
                lambda im: preprocess_device(im, size=224, pil_rounding=False, precision="default")
            )(images)
            params = calibrate_act_scales(model, params, pixels=pixels)

    _note(f"embed[{mode}]: params ready, compiling run program")

    @jax.jit
    def run(params, imgs_u8, steps):
        # ``steps`` is a TRACED fori_loop bound: one executable serves both
        # two-point variants (a static scan length would compile twice —
        # each relay compile costs 20-90 s, see BENCH_NOTES round 4).
        def body(step, carry):
            # roll by the step index: distinct inputs each step, all steps
            # feed the scalar output -> nothing can be elided
            shifted = jnp.roll(imgs_u8, step, axis=0)
            pixels = preprocess_device(shifted, size=224, pil_rounding=False, precision="default")
            emb = model.apply(params, pixels, method=ClipModel.encode_image)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return carry + jnp.sum(emb.astype(jnp.float32))

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    _timed_scalar(run, params, images, steps_small)  # one compile total
    _note(f"embed[{mode}]: compiled, timing")
    t_small = min(_timed_scalar(run, params, images, steps_small) for _ in range(3))
    t_large = min(_timed_scalar(run, params, images, steps_large) for _ in range(3))
    _note(f"embed[{mode}]: done")
    return batch_size * (steps_large - steps_small) / max(t_large - t_small, 1e-9)


def bench_text_embeddings(batch_size: int = 96, steps_small: int = 2, steps_large: int = 22) -> float:
    """Text tower (77-token BPE context) throughput, same methodology.
    batch 96 unpacked measured fastest on v5e (21.8k; 64 -> 19.5k, 128 ->
    20.7k, 192 -> 21.4k, 256 -> 18.9k; packing loses at L=77 —
    BENCH_NOTES continued session)."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params

    cfg = ClipConfig.vit_b32()
    model, params = init_params(cfg, seed=0, precision=Precision.bf16())

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, cfg.vocab_size - 2, (batch_size, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1
    tokens = jnp.asarray(tokens)

    @jax.jit
    def run(params, toks, steps):
        def body(step, carry):
            shifted = jnp.roll(toks, step, axis=0)
            emb = model.apply(params, shifted, method=ClipModel.encode_text)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return carry + jnp.sum(emb.astype(jnp.float32))

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    _note("text: compiling run program")
    _timed_scalar(run, params, tokens, steps_small)  # one compile total
    _note("text: compiled, timing")
    t_small = min(_timed_scalar(run, params, tokens, steps_small) for _ in range(3))
    t_large = min(_timed_scalar(run, params, tokens, steps_large) for _ in range(3))
    return batch_size * (steps_large - steps_small) / max(t_large - t_small, 1e-9)


def bench_knn(n_db: int = 131_072, d: int = 512, k: int = 51, steps_small: int = 1, steps_large: int = 3, precision: str = "highest") -> float:
    """Worst-case k (the paper sweeps k up to 50; +1 for self-exclusion).
    The query block is the index's production chunk (search_q_chunk), so
    the measured tile geometry is exactly what ExactKnnIndex.search runs;
    the two-point variable is a TRACED repeat count (queries rolled per
    step) so the whole leg costs ONE relay compile per precision."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.knn.index import _tiled_search, auto_tile, search_q_chunk, use_pallas_knn

    q = search_q_chunk()
    rng = np.random.default_rng(1)
    xb = rng.standard_normal((n_db, d)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = rng.standard_normal((q, d)).astype(np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)

    tile = auto_tile(n_db, q)
    pallas = use_pallas_knn()
    xb_dev = jnp.asarray(xb)  # _tiled_search pads internally
    xq_dev = jnp.asarray(xq)

    # the database is an argument (a closure would bake it into the HLO as
    # a constant, which the remote-compile service rejects for large arrays)
    @jax.jit
    def run(xq_dev, xb_arg, steps):
        def body(i, carry):
            qq = jnp.roll(xq_dev, i, axis=0)
            scores, idx = _tiled_search(
                qq, xb_arg, k=k, metric="ip", tile=tile, n_valid=n_db,
                use_pallas=pallas, precision=precision,
            )
            return carry + jnp.sum(scores) + jnp.sum(idx).astype(jnp.float32)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    _note(f"knn[{precision}]: compiling run program")
    _timed_scalar(run, xq_dev, xb_dev, steps_small)  # one compile total
    _note(f"knn[{precision}]: compiled, timing")
    t_small = min(_timed_scalar(run, xq_dev, xb_dev, steps_small) for _ in range(3))
    t_large = min(_timed_scalar(run, xq_dev, xb_dev, steps_large) for _ in range(3))
    return n_db * q * (steps_large - steps_small) / max(t_large - t_small, 1e-9)


def bench_knn_500k(n: int = 500_000, d: int = 512, k: int = 51) -> float:
    """BASELINE.json acceptance target: exact kNN over 500k CC3M-scale
    pairs in < 1 min (the reference caps its comparison set at 50k because
    FAISS-on-CPU is O(N^2) there; run_lemon.py:48,122-127). Wall-clock for
    the full 500k x 500k search at the paper's worst-case k, including
    query chunking, on-device data (host transfer through the tunnel would
    dominate otherwise and is not part of the claim)."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.knn.index import _tiled_search, auto_tile, use_pallas_knn, search_q_chunk

    def dev_unit(key, shape):
        f = jax.jit(lambda s: (lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True))(
            jax.random.normal(s, shape, jnp.float32)))
        x = f(jax.random.PRNGKey(key))
        x.block_until_ready()
        return x

    xb = dev_unit(0, (n, d))
    q_chunk = search_q_chunk()
    tile = auto_tile(n, q_chunk)
    pallas = use_pallas_knn()

    @jax.jit
    def run_chunk(xq_dev, xb_arg):
        s, i = _tiled_search(xq_dev, xb_arg, k=k, metric="ip", tile=tile,
                             n_valid=n, use_pallas=pallas)
        return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

    # compile outside the timed region (a user amortizes it across runs)
    _note("knn_scale: data on device, compiling search program")
    float(run_chunk(jax.lax.dynamic_slice_in_dim(xb, 0, q_chunk, 0), xb))
    _note("knn_scale: compiled, running")
    t0 = time.perf_counter()
    parts = []
    for start in range(0, n, q_chunk):
        # chunks dispatch async; the final scalar fetch forces the lot
        # (overlapping last-chunk row repeats keep shapes static)
        chunk = jax.lax.dynamic_slice_in_dim(xb, min(start, n - q_chunk), q_chunk, 0)
        parts.append(run_chunk(chunk, xb))
    total = float(jnp.sum(jnp.stack(parts)))
    assert np.isfinite(total)
    return time.perf_counter() - t0


def bench_knn_1m(n: int = 1_000_000, d: int = 512, k: int = 51) -> float:
    """Beyond-the-acceptance-bar scale point: exact kNN over 1M x 1M pairs
    (20x the reference's 50k FAISS-CPU cap, run_lemon.py:48,122-127; 2x the
    BASELINE.json 500k acceptance target). Same methodology as
    :func:`bench_knn_500k` — on-device data, compile outside the timed
    region, async chunk dispatch forced by one final scalar fetch. The
    database is 2 GB fp32 on HBM; the auto tile keeps each (8192, tile)
    score block inside the 4 GB budget (8 tiles -> the multi-tile scan +
    merge path, unlike the single-tile 131k geometry)."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.knn.index import _tiled_search, auto_tile, use_pallas_knn, search_q_chunk

    def dev_unit(key, shape):
        f = jax.jit(lambda s: (lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True))(
            jax.random.normal(s, shape, jnp.float32)))
        x = f(jax.random.PRNGKey(key))
        x.block_until_ready()
        return x

    xb = dev_unit(0, (n, d))
    q_chunk = search_q_chunk()
    tile = auto_tile(n, q_chunk)
    pallas = use_pallas_knn()

    @jax.jit
    def run_chunk(xq_dev, xb_arg):
        s, i = _tiled_search(xq_dev, xb_arg, k=k, metric="ip", tile=tile,
                             n_valid=n, use_pallas=pallas)
        return jnp.sum(s) + jnp.sum(i).astype(jnp.float32)

    _note("knn_scale: data on device, compiling search program")
    float(run_chunk(jax.lax.dynamic_slice_in_dim(xb, 0, q_chunk, 0), xb))
    _note("knn_scale: compiled, running")
    t0 = time.perf_counter()
    parts = []
    for start in range(0, n, q_chunk):
        chunk = jax.lax.dynamic_slice_in_dim(xb, min(start, n - q_chunk), q_chunk, 0)
        parts.append(run_chunk(chunk, xb))
    total = float(jnp.sum(jnp.stack(parts)))
    assert np.isfinite(total)
    return time.perf_counter() - t0


def bench_train_step(batch_size: int = 256, steps_small: int = 1, steps_large: int = 9, precision: str = "bf16") -> float:
    """Contrastive CLIP training-step throughput (pairs/s/chip), the
    train_clip_from_scratch.py:153-187 hot loop: full fwd+bwd+AdamW update
    with global-batch InfoNCE, as one scanned jit program (two-point
    measurement like every other workload here)."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.models.clip import ClipConfig
    from lemon_tpu.train.contrastive import TrainConfig, clip_loss, create_train_state

    cfg = ClipConfig.vit_b32()
    model, state = create_train_state(cfg, TrainConfig(precision=precision))

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((batch_size, 224, 224, 3)).astype(np.float32))
    tokens = rng.integers(1, cfg.vocab_size - 2, (batch_size, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1
    tokens = jnp.asarray(tokens)

    @jax.jit
    def run(state, pixels, tokens, steps):
        def body(step, carry):
            st, total = carry

            def loss_fn(params):
                logits_i, logits_t = model.apply(params, jnp.roll(pixels, step, 0), jnp.roll(tokens, step, 0))
                return clip_loss(logits_i, logits_t)

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads=grads), total + loss

        _, total = jax.lax.fori_loop(0, steps, body, (state, jnp.float32(0)))
        return total

    _note("train: compiling run program")
    _timed_scalar(run, state, pixels, tokens, steps_small)  # one compile total
    _note("train: compiled, timing")
    t_small = min(_timed_scalar(run, state, pixels, tokens, steps_small) for _ in range(2))
    t_large = min(_timed_scalar(run, state, pixels, tokens, steps_large) for _ in range(2))
    return batch_size * (steps_large - steps_small) / max(t_large - t_small, 1e-9)


def _e2e_config(n: int, cache_dir: str):
    from lemon_tpu.detect import DetectionConfig

    return DetectionConfig(
        dataset="synthetic_caption",
        noise_type="random",
        noise_level=0.4,
        clip_model="huggingface_clip",
        knn_k=50,
        batch_size=256,
        synthetic_n=n,
        skip_train=True,
        embedding_cache=cache_dir,
        grid={"beta": [0, 5, 20, 100], "gamma": [0, 5, 20, 100], "tau_1": [0, 1, 5, 10], "tau_2": [0, 1, 5, 10]},
    )


# ---------------------------------------------------------------------------
# leg runners: each prints CUMULATIVE JSON after every completed
# sub-measurement, so a timeout mid-leg keeps everything finished so far.
# Sub-measurements whose keys the parent already holds (LEMON_BENCH_HAVE)
# are skipped, so a retried leg resumes at its first missing field.

_HAVE_KEYS: frozenset = frozenset()


def _emit(out: dict):
    print(json.dumps(out), flush=True)


def _done(key: str) -> bool:
    return key in _HAVE_KEYS


def _leg_headline(out):
    """The survival leg: the bf16 image number (the bench's `value` field)
    first, then text in the same process — one import/backend handshake
    for both towers."""
    if not _done("image_embeddings_per_sec_bf16"):
        out["image_embeddings_per_sec_bf16"] = round(bench_embeddings(mode="bf16"), 1)
        _emit(out)
    if not _done("text_embeddings_per_sec"):
        out["text_embeddings_per_sec"] = round(bench_text_embeddings(), 1)
        _emit(out)


def _leg_image_bf16(out):
    rate = bench_embeddings(mode="bf16")
    out["image_embeddings_per_sec_bf16"] = round(rate, 1)
    _emit(out)


def _leg_image_int8(out):
    rate = bench_embeddings(mode="int8_static")
    out["image_embeddings_per_sec_int8_static"] = round(rate, 1)
    _emit(out)


def _leg_text(out):
    out["text_embeddings_per_sec"] = round(bench_text_embeddings(), 1)
    _emit(out)


def _leg_knn(out):
    if not _done("knn_pairs_per_sec"):
        out["knn_pairs_per_sec"] = round(bench_knn(), 0)
        _emit(out)
    # opt-in bf16x3 fast mode shares the leg (same arrays, second compile)
    if not _done("knn_pairs_per_sec_bf16x3"):
        out["knn_pairs_per_sec_bf16x3"] = round(bench_knn(precision="high"), 0)
        _emit(out)


def _leg_knn_500k(out):
    out["knn_500k_seconds"] = round(bench_knn_500k(), 1)
    _emit(out)


def _leg_knn_1m(out):
    out["knn_1m_seconds"] = round(bench_knn_1m(), 1)
    _emit(out)


def _leg_train_bf16(out):
    out["clip_train_pairs_per_sec_bf16"] = round(bench_train_step(precision="bf16"), 1)
    _emit(out)


def _leg_e2e(out, n: int = 20_000):
    """Full detection pipeline wall-clock (the run_lemon.py:135,309-312
    analog): synthetic captioning pairs, ViT-B/32, k=50, val/test scoring +
    hparam optimization, including all jit compiles.

    The synthetic corpus is 20k 32x32 pairs (~61 MB of pixels — measured
    round 4; earlier rounds' "3.9 GB through the relay" claim was wrong,
    see BENCH_NOTES 'warm e2e decomposition'), so the COLD run's wall-clock
    spread is server compile + relay RPC weather, not pixel transfer; its
    embed phase (which includes the one-time lazy image render) is broken
    out so the compute side stays comparable across rounds. The single
    WARM run reuses the embedding cache (the repeat-run mode a sweep over
    hparams/k/seeds hits: embeddings depend only on data+model,
    run_lemon.py:136-164) and — with the round-4 lazy render + generator
    fingerprint keying — reads zero pixels, so it measures the detection
    pipeline proper. Cumulative JSON is emitted after cold, so a timeout
    during warm keeps the cold result.

    Retry semantics (round-5 review finding): the embedding cache lives at
    a STABLE path and is deleted only when this process is about to
    measure cold — so a Phase-3 retry whose LEMON_BENCH_HAVE carries the
    cold keys skips straight to warm and reads the first attempt's cache
    (entries are content-addressed generator fingerprints, so reuse is
    bit-safe) instead of re-paying the full cold pipeline inside its
    shared end-of-budget slice. The next full bench invocation measures
    cold honestly again because its own cold path deletes the cache
    first."""
    import shutil
    import tempfile

    from lemon_tpu.detect import run_detection

    # The embed phase runs the bf16 fast path explicitly (not whatever the
    # ambient env says); fp32 remains the AUROC-parity mode and the int8
    # drift study lives in BENCH_NOTES.
    os.environ["LEMON_TPU_PRECISION"] = "bf16"
    cache_dir = os.path.join(tempfile.gettempdir(), "lemon_bench_emb_cache")
    auroc = None
    if not _done("e2e_detect_20k_seconds"):
        shutil.rmtree(cache_dir, ignore_errors=True)  # guarantee COLD semantics
    os.makedirs(cache_dir, exist_ok=True)
    cfg = _e2e_config(n, cache_dir)
    if not _done("e2e_detect_20k_seconds"):
        _note("e2e: cold run_detection")
        t0 = time.time()
        res = run_detection(cfg)
        wall = time.time() - t0
        auroc = res["agg_results"]["know_val_labels"]["test"]["AUROC"]
        out["e2e_detect_20k_seconds"] = round(wall, 1)
        out["e2e_detect_20k_test_auroc"] = round(float(auroc), 4)
        timing = res.get("phase_timing") or {}
        embed_s = sum(v for p, v in timing.items() if p.startswith("embed_"))
        if embed_s:
            # embed phase = one-time lazy render + relay transfer (~61 MB)
            # + on-chip encode; the old e2e_relay_mb_per_s field divided a
            # FICTIONAL 3.9 GB by this and is retired (round 4).
            out["e2e_detect_20k_embed_seconds"] = round(embed_s, 1)
        _emit(out)
    else:
        _note("e2e: cold already captured - skipping to warm")
    if not _done("e2e_detect_20k_warm_seconds"):
        _note("e2e: warm run_detection")
        t0 = time.time()
        res_w = run_detection(cfg)
        out["e2e_detect_20k_warm_seconds"] = round(time.time() - t0, 1)
        # phase-timer sum alongside the wall: in full-bench context the warm
        # wall reads ~1.7-2 s above the standalone/probe value (4.4-4.5 vs
        # 2.5-2.7 s, round 5) — the phases themselves stay ~2.2 s, so the
        # delta is relay/dispatch state after the prior legs, and recording
        # both keeps that attribution in the driver record
        timing_w = res_w.get("phase_timing") or {}
        if timing_w:
            out["e2e_detect_20k_warm_phase_seconds"] = round(sum(timing_w.values()), 1)
        auroc_w = res_w["agg_results"]["know_val_labels"]["test"]["AUROC"]
        if auroc is not None:
            assert abs(float(auroc_w) - float(auroc)) < 1e-6, "cache changed results"
        else:
            # retry path: the cold AUROC lives in the parent's merged result
            # (keys-only ride in LEMON_BENCH_HAVE), so record the warm one
            # for the cross-attempt consistency check instead of asserting
            out["e2e_detect_20k_test_auroc_warm"] = round(float(auroc_w), 4)
        _emit(out)


_LEGS = {
    "headline": _leg_headline,
    "image_bf16": _leg_image_bf16,
    "image_int8": _leg_image_int8,
    "text": _leg_text,
    "knn": _leg_knn,
    "knn_500k": _leg_knn_500k,
    "knn_1m": _leg_knn_1m,
    "train_bf16": _leg_train_bf16,
    "e2e": _leg_e2e,
}


def run_leg(name: str) -> None:
    global _HAVE_KEYS
    _HAVE_KEYS = frozenset(json.loads(os.environ.get("LEMON_BENCH_HAVE", "[]")))

    import jax

    from lemon_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    _note("leg start: jax imported, resolving backend")
    out = {"backend": jax.default_backend()}
    _emit(out)  # even an immediately-hung leg reports the backend
    _LEGS[name](out)


# ---------------------------------------------------------------------------
# parent orchestrator (host-only: never imports jax, never touches the relay)

# Cost model (round-4 measurements): warm-server-cache legs run in
# 12-56 s; a leg paying FRESH server-side compiles costs ~60-90 s per
# program normally — but the late-round-4 relay stall wave measured
# single compiles at 166 s (text), 315 s (bf16 embed) and 513 s (e2e
# embed), and the server cache evicted programs within ~30-40 min under
# other tenants' load. A KILLED compile does not persist server-side.
#
# The headline leg therefore runs UNCAPPED (every attempt gets all
# remaining budget — see the Phase 1 comment in main() for the round-5
# measurement that killed the staged-cap design: a stall-wave compile
# of this leg's single program ran past a 940 s first cap, and the
# kill+retry split turned a landable compile into value 0.0). Surplus
# legs keep tighter caps and degrade to skips — the right failure
# order (headline field first).
_HEADLINE_KEY = "image_embeddings_per_sec_bf16"  # = the JSON `value` field

# (name, soft cost estimate s, hard per-leg timeout s), run only once the
# headline number exists, in this order.
_SURPLUS_PLAN = [
    # image_int8 first: it is the one surplus leg that can RAISE the
    # headline `value` field (finalize takes max(bf16, int8) and int8
    # measures +6-10% same-session, drift study round 5)
    ("image_int8", 180, 390),
    ("knn", 150, 420),
    # e2e before train/knn_500k: it yields four fields incl. the AUROC
    # (the SURVEY §6 parity signal) — round-5 run 1 had it LAST in line
    # and it landed with 12 s to spare only because its own cap was
    # squeezed to the remainder
    ("e2e", 300, 600),
    ("train_bf16", 150, 330),
    ("knn_500k", 140, 360),
    # optional beyond-scale point: only runs when the budget has room left
    # after every headline leg (the parent skips it otherwise)
    ("knn_1m", 130, 300),
]
_RESERVE_S = 15  # parent bookkeeping + final print


def _merge_from_lines(result: dict, stdout_text: str) -> None:
    for line in stdout_text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                result.update(json.loads(line))
            except json.JSONDecodeError:
                pass


def main() -> None:
    budget = float(os.environ.get("LEMON_BENCH_BUDGET_S", 1260))
    t_start = time.time()
    result: dict = {}
    leg_seconds: dict = {}
    skipped: list = []
    failed: list = []

    def finalize(_sig=None, _frame=None):
        emb_bf16 = result.get("image_embeddings_per_sec_bf16", 0.0)
        emb_int8 = result.get("image_embeddings_per_sec_int8_static", 0.0)
        emb = max(emb_bf16, emb_int8)
        final = {
            "metric": "clip_vitb32_image_embeddings_per_sec_per_chip",
            "value": round(emb, 1),
            "unit": "embeddings/s",
            "vs_baseline": round(emb / 50_000.0, 4),
            "image_embed_mode": "int8_static" if emb_int8 > emb_bf16 else "bf16",
            **result,
            "leg_seconds": {k: round(v, 1) for k, v in leg_seconds.items()},
            "legs_skipped": skipped,
            "legs_failed": failed,
            "bench_budget_s": budget,
            "bench_wall_s": round(time.time() - t_start, 1),
        }
        print(json.dumps(final), flush=True)
        if _sig is not None:
            os._exit(0)  # outer-timeout path: the JSON line is already out

    # If the driver's own timeout fires first, still get the line out.
    signal.signal(signal.SIGTERM, finalize)
    signal.signal(signal.SIGINT, finalize)

    def remaining_s() -> float:
        return budget - _RESERVE_S - (time.time() - t_start)

    def run_once(name: str, leg_timeout: float) -> str:
        """One leg subprocess under ``leg_timeout``. Returns 'ok', 'fail'
        (rc!=0), or 'timeout'."""
        env = {**os.environ, "LEMON_BENCH_HAVE": json.dumps(sorted(result.keys()))}
        t0 = time.time()
        status = "fail"
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), "--leg", name],
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                timeout=leg_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env=env,
                text=True,
            )
            _merge_from_lines(result, proc.stdout)
            status = "ok" if proc.returncode == 0 else "fail"
        except subprocess.TimeoutExpired as e:
            stdout_text = e.stdout if isinstance(e.stdout, str) else (e.stdout or b"").decode(errors="replace")
            _merge_from_lines(result, stdout_text)
            print(f"[bench] leg {name} timed out at {leg_timeout:.0f}s", file=sys.stderr, flush=True)
            # the relay serves one client at a time; give it a beat to reap
            # the SIGKILLed leg's session before the next client connects
            time.sleep(10)
            status = "timeout"
        leg_seconds[name] = leg_seconds.get(name, 0.0) + (time.time() - t0)
        return status

    def attempt(name: str, leg_timeout: float) -> bool:
        """Run one leg subprocess under ``leg_timeout``; merge whatever it
        printed; True on clean completion. The current result keys ride
        along in LEMON_BENCH_HAVE so a retried leg skips finished
        sub-measurements. A NON-timeout rc!=0 failure gets ONE immediate
        retry: that signature is usually a transient relay error (round-5
        run 1: `remote_compile: response body closed` killed the int8 leg
        at +155 s with 235 s of cap unused), and finished server-side
        compiles persist, so the retry resumes from warm cache and skips
        captured sub-measurements. Timeouts deliberately do NOT retry
        here: a killed compile does not persist, and the Phase-3 shared
        retry pass is the right venue for those."""
        print(f"[bench] leg {name} (timeout {leg_timeout:.0f}s)", file=sys.stderr, flush=True)
        t0 = time.time()
        status = run_once(name, leg_timeout)
        if status == "fail":
            # the retry gets the leg's UNUSED cap remainder (bounded by the
            # global budget), not a second full cap — one flaky leg must not
            # consume ~2x its budget share and starve the later legs
            retry_cap = min(leg_timeout - (time.time() - t0), remaining_s())
            if retry_cap >= 60:
                print(f"[bench] leg {name} failed (rc!=0) - immediate retry ({retry_cap:.0f}s)", file=sys.stderr, flush=True)
                # give the single-client relay a beat to reap the abnormally
                # ended session before the retry connects (timeout path
                # sleeps 10 s for the same reason)
                time.sleep(5)
                status = run_once(name, retry_cap)
        return status == "ok"

    # --- Phase 1: SURVIVAL. Land the headline number before anything else.
    # EVERY attempt gets ALL remaining budget. The headline's image
    # measurement is ONE jitted program and killed compiles do not persist
    # server-side, so for this leg P(landing) = P(one uninterrupted
    # compile+measure fits the budget) — any cap split is strictly worse
    # (round 5 measured it: a 940 s wave compile was killed at the old
    # 940 s first cap, the 295 s retry restarted the compile from scratch,
    # value 0.0; the same budget as one attempt would have landed anything
    # up to ~1240 s, and the morning's wave compiled this program in
    # 790 s). The leg emits cumulative JSON, so a timeout after the image
    # number but mid-text still keeps `value`. A fast rc!=0 failure (a
    # code bug, not relay weather) breaks out after two tries; attempting
    # other legs before the headline lands buys nothing — round 4 measured
    # 4 consecutive timeouts and zero numbers that way.
    quick_failures = 0
    attempts = 0
    while _HEADLINE_KEY not in result and remaining_s() >= 60 and attempts < 4 and quick_failures < 2:
        cap = remaining_s()
        t0 = time.time()
        attempt("headline", cap)
        # an attempt is now up to TWO runs (the immediate rc!=0 retry), and
        # a code-bug crash can still pay the ~15-25 s jax-import/backend
        # phase per run — 90 s covers two such crashes while staying far
        # under any legitimate failure (a weather failure either times out
        # at the cap or burns minutes in compile first)
        if _HEADLINE_KEY not in result and time.time() - t0 < 90:
            quick_failures += 1
        attempts += 1
    headline_complete = _HEADLINE_KEY in result and "text_embeddings_per_sec" in result
    if not headline_complete:
        failed.append("headline")  # retry pass may still pick up text

    # --- Phase 2: surplus legs, only now that the headline field exists.
    for name, est, cap in _SURPLUS_PLAN:
        if remaining_s() < min(60, est):
            skipped.append(name)
            print(f"[bench] skip {name}: {remaining_s():.0f}s left", file=sys.stderr, flush=True)
            continue
        if not attempt(name, min(cap, remaining_s())):
            failed.append(name)

    # --- Phase 3: retry pass. A timed-out leg usually died mid-compile on
    # a congested relay, and the relay's SERVER-side compile cache keeps
    # whatever its first attempt finished compiling (keyed on HLO,
    # cross-process — BENCH_NOTES round 4) — so a second attempt resumes
    # from warm cache, skips captured sub-measurements, and typically
    # completes in well under a minute. Each retry gets its share of what
    # is LEFT, not the cap that already failed once.
    for name in list(failed):
        rem = remaining_s()
        if rem < 60:
            print(f"[bench] skip retry {name}: {rem:.0f}s left", file=sys.stderr, flush=True)
            continue
        print(f"[bench] retry {name}", file=sys.stderr, flush=True)
        if attempt(name, rem / len(failed)):
            failed.remove(name)

    finalize()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        run_leg(sys.argv[2])
    else:
        main()
