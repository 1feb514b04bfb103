"""Pallas flash-attention parity vs plain XLA attention (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params
from lemon_tpu.ops.attention import flash_attention, reference_attention


def qkv(b, l, h, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("l", [50, 77, 128, 200])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(l, causal):
    q, k, v = qkv(2, l, 2, 64, seed=l)
    ref = reference_attention(q, k, v, causal=causal)
    ours = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_handles_unpadded_lengths():
    q, k, v = qkv(1, 33, 1, 64, seed=3)
    ref = reference_attention(q, k, v, causal=True)
    ours = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_clip_tower_with_pallas_attention_matches_xla():
    """End-to-end: the same params give the same embeddings under
    attention_impl='pallas' (interpret) and 'xla'."""
    import dataclasses

    cfg = ClipConfig.tiny()
    model, params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (2, 16)), jnp.int32)
    tokens = tokens.at[:, -1].set(cfg.vocab_size - 1)

    ref_img = model.apply(params, pixels, method=ClipModel.encode_image)
    ref_txt = model.apply(params, tokens, method=ClipModel.encode_text)

    # attention_impl='pallas' auto-runs the kernel in interpret mode on CPU
    cfg_p = dataclasses.replace(cfg, attention_impl="pallas")
    model_p = ClipModel(cfg_p)
    img = model_p.apply(params, pixels, method=ClipModel.encode_image)
    txt = model_p.apply(params, tokens, method=ClipModel.encode_text)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(txt), np.asarray(ref_txt), rtol=1e-4, atol=1e-4)
