"""int8 (W8A8) fast-path correctness: quantized projections, param
transform, encoder integration. Rate evidence lives in
benchmarks/probe_pallas_int8.py + BENCH_NOTES (XLA int8 318-355 TOPS vs
163-202 bf16 at the ViT shapes on v5e)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_quant_dense_matches_manual_math():
    from lemon_tpu.models.clip import QuantDense, quantize_clip_params

    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 24)).astype(np.float32)
    b = rng.normal(size=24).astype(np.float32)
    x = rng.normal(size=(4, 5, 16)).astype(np.float32)

    q = quantize_clip_params({"qkv": {"kernel": w, "bias": b}})["qkv"]
    model = QuantDense(24, dtype=jnp.float32)
    out = model.apply({"params": q}, jnp.asarray(x))

    a = x.reshape(-1, 16)
    a_scale = np.maximum(np.abs(a).max(-1, keepdims=True), 1e-12) / 127.0
    a_q = np.round(a / a_scale).astype(np.int8)
    ref = (a_q.astype(np.int32) @ q["kernel_q"].astype(np.int32)).astype(np.float32)
    ref = ref * a_scale * q["kernel_scale"] + b
    np.testing.assert_allclose(np.asarray(out), ref.reshape(4, 5, 24), rtol=1e-5, atol=1e-5)
    # quantization error of the layer itself stays at int8 scale
    exact = x @ w + b
    rel = np.abs(np.asarray(out) - exact).max() / np.abs(exact).max()
    assert rel < 0.05, rel


def test_int8_tower_embeddings_track_fp32():
    """Full two-tower forward under Precision.int8 vs fp32: same tree
    quantized once; embeddings must stay highly aligned (this bounds the
    mode's effect on the cosine-distance detection pipeline)."""
    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params, quantize_clip_params

    cfg = ClipConfig.tiny()
    model_fp32, params = init_params(cfg, seed=0)
    model_int8 = ClipModel(cfg, precision=Precision.int8())
    q_params = quantize_clip_params(params)

    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (8, cfg.context_length)), jnp.int32)

    for method, arg in (("encode_image", pixels), ("encode_text", tokens)):
        ref = np.asarray(model_fp32.apply(params, arg, method=method), np.float64)
        got = np.asarray(model_int8.apply(q_params, arg, method=method), np.float64)
        ref_n = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got_n = got / np.linalg.norm(got, axis=-1, keepdims=True)
        cos = (ref_n * got_n).sum(-1)
        assert cos.min() > 0.98, (method, cos.min())


def test_int8_encoder_end_to_end():
    """ClipEncoder under Precision.int8: params quantize once at build and
    the embed path runs; detection-relevant invariants hold (unit norm,
    finite)."""
    from lemon_tpu.core.precision import Precision
    from lemon_tpu.data.datasets import get_dataset
    from lemon_tpu.models.clip import ClipConfig, init_params
    from lemon_tpu.models.encoder import ClipEncoder

    cfg = ClipConfig.tiny()
    model, params = init_params(cfg, seed=0, precision=Precision.int8())
    enc = ClipEncoder(model, params, batch_size=8)
    flat = jax.tree_util.tree_flatten_with_path(enc.params)[0]
    assert any("kernel_q" in str(p[-1]) for p, _ in flat), "params were not quantized"

    from lemon_tpu.data.datasets import load_images

    train, _, _ = get_dataset("synthetic_caption", data_seed=0, synthetic_n=24)
    img = enc.encode_images(load_images(train, np.arange(16)))
    txt = enc.encode_texts(list(train.sentence[:16]))
    for emb in (img, txt):
        assert np.isfinite(emb).all()
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-3)


def test_static_act_quant_dense_and_calibration():
    """Static-act QuantDense: calibrated per-layer scale reproduces the
    manual math and keeps the layer's quantization error at int8 scale."""
    from lemon_tpu.models.clip import QuantDense, quantize_clip_params

    rng = np.random.default_rng(2)
    w = rng.normal(size=(16, 24)).astype(np.float32)
    b = rng.normal(size=24).astype(np.float32)
    x = rng.normal(size=(4, 5, 16)).astype(np.float32)

    q = quantize_clip_params({"qkv": {"kernel": w, "bias": b}}, static_act=True)["qkv"]
    assert q["act_scale"] == np.float32(1.0)
    # calibrate by hand: symmetric max-abs over the batch
    amax = np.abs(x).max()
    q = {**q, "act_scale": np.float32(amax / 127.0)}

    model = QuantDense(24, dtype=jnp.float32, static_act=True)
    out = model.apply({"params": q}, jnp.asarray(x))

    a = x.reshape(-1, 16)
    a_q = np.clip(np.round(a / q["act_scale"]), -127, 127).astype(np.int8)
    ref = (a_q.astype(np.int32) @ q["kernel_q"].astype(np.int32)).astype(np.float32)
    ref = ref * (q["act_scale"] * q["kernel_scale"]) + b
    np.testing.assert_allclose(np.asarray(out), ref.reshape(4, 5, 24), rtol=1e-5, atol=1e-5)
    exact = x @ w + b
    rel = np.abs(np.asarray(out) - exact).max() / np.abs(exact).max()
    assert rel < 0.05, rel


def test_weight_only_quant_dense_math():
    """weight_only=True consumes the SAME quantized param tree but runs a
    dequantized ordinary matmul with unquantized activations — exactly
    x @ (kernel_q * kernel_scale) + bias. This is the pooled-last-block
    small-M path (BENCH_NOTES round 4: the int8 dot at M=128 CLS rows
    cost ~0.3 ms MORE than a full-length int8 block)."""
    from lemon_tpu.models.clip import QuantDense, quantize_clip_params

    rng = np.random.default_rng(5)
    w = rng.normal(size=(16, 24)).astype(np.float32)
    b = rng.normal(size=24).astype(np.float32)
    x = rng.normal(size=(4, 5, 16)).astype(np.float32)

    for static in (False, True):
        q = quantize_clip_params({"qkv": {"kernel": w, "bias": b}}, static_act=static)["qkv"]
        model = QuantDense(24, dtype=jnp.float32, static_act=static, weight_only=True)
        out = model.apply({"params": q}, jnp.asarray(x))
        ref = x @ (q["kernel_q"].astype(np.float32) * q["kernel_scale"]) + b
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
        # weight-only error vs the exact fp32 layer is SMALLER than W8A8's
        # (no activation quantization term)
        exact = x @ w + b
        rel = np.abs(np.asarray(out) - exact).max() / np.abs(exact).max()
        assert rel < 0.02, rel
        # the param tree is identical to the full-int8 layer's
        full = QuantDense(24, dtype=jnp.float32, static_act=static)
        tree_wo = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x)))
        tree_fq = jax.eval_shape(lambda: full.init(jax.random.PRNGKey(0), jnp.asarray(x)))
        assert jax.tree_util.tree_structure(tree_wo) == jax.tree_util.tree_structure(tree_fq)


def test_pooled_block_weight_only_does_not_degrade_alignment():
    """The pooled int8_static tower (whose last block now runs weight-only
    projections at M = CLS rows) must track fp32 at least as well as the
    unpooled all-int8 tower — weight_only drops the activation-quantize
    error term, so alignment can only improve there."""
    import dataclasses as dc

    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import (
        ClipConfig,
        ClipModel,
        calibrate_act_scales,
        init_params,
        quantize_clip_params,
    )

    cfg = ClipConfig.tiny()
    model_fp32, params = init_params(cfg, seed=0)
    q_params = quantize_clip_params(params, static_act=True)

    rng = np.random.default_rng(6)
    pixels = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)

    def min_cos(model, p):
        ref = np.asarray(model_fp32.apply(params, pixels, method="encode_image"), np.float64)
        got = np.asarray(model.apply(p, pixels, method="encode_image"), np.float64)
        ref_n = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got_n = got / np.linalg.norm(got, axis=-1, keepdims=True)
        return (ref_n * got_n).sum(-1).min()

    prec = Precision.int8_static()
    pooled = ClipModel(cfg, precision=prec)
    unpooled = ClipModel(cfg, precision=dc.replace(prec, pool_last_block=False))
    qp = calibrate_act_scales(pooled, q_params, pixels=pixels)
    qu = calibrate_act_scales(unpooled, q_params, pixels=pixels)
    cos_pooled, cos_unpooled = min_cos(pooled, qp), min_cos(unpooled, qu)
    assert cos_pooled > 0.97, cos_pooled
    assert cos_pooled >= cos_unpooled - 1e-3, (cos_pooled, cos_unpooled)


def test_static_act_sow_is_inert_without_mutable():
    """The act_amax sow must not leak a variables tree on normal applies
    (it is dead code unless act_stats is mutable)."""
    from lemon_tpu.models.clip import QuantDense, quantize_clip_params

    rng = np.random.default_rng(3)
    q = quantize_clip_params(
        {"qkv": {"kernel": rng.normal(size=(8, 8)).astype(np.float32), "bias": np.zeros(8, np.float32)}}
    )["qkv"]
    x = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    out = QuantDense(8, dtype=jnp.float32).apply({"params": q}, x)  # plain apply: no mutable error
    assert np.isfinite(np.asarray(out)).all()
    _, variables = QuantDense(8, dtype=jnp.float32).apply({"params": q}, x, mutable=["act_stats"])
    amax = np.asarray(jax.tree_util.tree_leaves(variables["act_stats"])[0]).max()
    np.testing.assert_allclose(amax, np.abs(np.asarray(x)).max(), rtol=1e-6)


def test_int8_static_tower_embeddings_track_fp32():
    """Full two-tower forward under Precision.int8_static after lazy
    calibration vs fp32: alignment must hold like the dynamic mode."""
    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import (
        ClipConfig,
        ClipModel,
        calibrate_act_scales,
        init_params,
        quantize_clip_params,
    )

    cfg = ClipConfig.tiny()
    model_fp32, params = init_params(cfg, seed=0)
    model_s = ClipModel(cfg, precision=Precision.int8_static())
    q_params = quantize_clip_params(params, static_act=True)

    rng = np.random.default_rng(4)
    pixels = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (8, cfg.context_length)), jnp.int32)
    q_params = calibrate_act_scales(model_s, q_params, pixels=pixels, tokens=tokens)
    # every quantized layer got a real scale
    scales = [
        np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(q_params)[0]
        if "act_scale" in str(p[-1])
    ]
    assert scales and all(s != 1.0 for s in scales)

    for method, arg in (("encode_image", pixels), ("encode_text", tokens)):
        ref = np.asarray(model_fp32.apply(params, arg, method=method), np.float64)
        got = np.asarray(model_s.apply(q_params, arg, method=method), np.float64)
        ref_n = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got_n = got / np.linalg.norm(got, axis=-1, keepdims=True)
        cos = (ref_n * got_n).sum(-1)
        assert cos.min() > 0.97, (method, cos.min())


def test_int8_static_encoder_lazy_calibration():
    """ClipEncoder under Precision.int8_static: act scales start as
    placeholders, calibrate on the first batch per tower, then stay fixed;
    embeddings keep the detection invariants."""
    from lemon_tpu.core.precision import Precision
    from lemon_tpu.data.datasets import get_dataset, load_images
    from lemon_tpu.models.clip import ClipConfig, init_params
    from lemon_tpu.models.encoder import ClipEncoder

    cfg = ClipConfig.tiny()
    model, params = init_params(cfg, seed=0, precision=Precision.int8_static())
    enc = ClipEncoder(model, params, batch_size=8)
    # text is never quantized (vision-only int8), so only the vision tower
    # awaits calibration
    assert not enc._calibrated["img"] and enc._calibrated["txt"]

    train, _, _ = get_dataset("synthetic_caption", data_seed=0, synthetic_n=24)
    img = enc.encode_images(load_images(train, np.arange(16)))
    assert enc._calibrated["img"]
    txt = enc.encode_texts(list(train.sentence[:16]))
    for emb in (img, txt):
        assert np.isfinite(emb).all()
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-3)
    # scales are baked: a second pass reuses them bit-for-bit
    img2 = enc.encode_images(load_images(train, np.arange(16)))
    np.testing.assert_array_equal(img, img2)

    # embed_split path calibrates both towers from its first batch
    enc2 = ClipEncoder(model, params, batch_size=8)
    img3, txt3 = enc2.embed_split(train, list(train.sentence))
    assert enc2._calibrated == {"img": True, "txt": True}
    assert np.isfinite(img3).all() and np.isfinite(txt3).all()


def test_int8_static_calibration_robust_to_degenerate_batch():
    """Lazy first-batch calibration must not silently degrade on a
    pathological first batch (round-3 verdict item 4). The mechanism that
    makes this safe: every quantized projection sits behind a LayerNorm
    (or a GELU of LN'd input), so activation ranges are
    normalization-bounded and nearly input-independent — the
    calibration-batch contract documented in core/precision.py. This pins
    it: calibrating on all-black / all-white / max-contrast binary images
    must keep (a) tower alignment vs fp32 at the same floor as real-batch
    calibration and (b) every per-layer scale within a small factor of
    its real-batch value."""
    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import (
        ClipConfig,
        ClipModel,
        calibrate_act_scales,
        init_params,
        quantize_clip_params,
    )

    cfg = ClipConfig.tiny()
    model_fp32, params = init_params(cfg, seed=0)
    model_s = ClipModel(cfg, precision=Precision.int8_static())

    rng = np.random.default_rng(4)
    real = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    ref = np.asarray(model_fp32.apply(params, real, method="encode_image"), np.float64)
    ref_n = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    def scales_of(tree):
        return {
            "/".join(str(x) for x in p): float(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
            if "act_scale" in str(p[-1])
        }

    q_real = calibrate_act_scales(
        model_s, quantize_clip_params(params, static_act=True), pixels=real
    )
    ref_scales = scales_of(q_real)
    assert ref_scales

    degenerate = {
        "black": jnp.zeros((8, 32, 32, 3), jnp.float32),
        "white": jnp.ones((8, 32, 32, 3), jnp.float32),
        "binary": jnp.asarray((rng.random((8, 32, 32, 3)) > 0.5).astype(np.float32)),
    }
    for tag, calib in degenerate.items():
        q = calibrate_act_scales(
            model_s, quantize_clip_params(params, static_act=True), pixels=calib
        )
        got = np.asarray(model_s.apply(q, real, method="encode_image"), np.float64)
        got_n = got / np.linalg.norm(got, axis=-1, keepdims=True)
        cos = (ref_n * got_n).sum(-1)
        # same floor as test_int8_static_tower_embeddings_track_fp32 — a
        # degenerate calibration batch buys no slack
        assert cos.min() > 0.97, (tag, cos.min())
        for name, s in scales_of(q).items():
            ratio = s / ref_scales[name]
            assert 0.25 < ratio < 4.0, (tag, name, ratio)
