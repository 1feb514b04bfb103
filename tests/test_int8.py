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
