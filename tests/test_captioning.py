"""Captioner model + downstream captioning trainer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemon_tpu.data.datasets import synthetic_captioning
from lemon_tpu.models.captioner import (
    CaptionerConfig,
    CaptioningModel,
    LoraDense,
    init_captioner,
    lora_trainable_mask,
)
from lemon_tpu.train.captioning import (
    CaptionTrainConfig,
    filter_caption_split,
    per_sample_caption_losses,
    train_captioner,
)


@pytest.fixture(scope="module")
def captioner():
    cfg = CaptionerConfig.tiny()
    model, params = init_captioner(cfg, seed=0)
    return cfg, model, params


def test_forward_shapes(captioner):
    cfg, model, params = captioner
    pixels = jnp.zeros((2, 32, 32, 3))
    tokens = jnp.zeros((2, cfg.max_text_len), jnp.int32)
    logits = model.apply(params, pixels, tokens)
    assert logits.shape == (2, cfg.max_text_len, cfg.vocab_size)


def test_per_sample_loss_masks_padding(captioner):
    cfg, model, params = captioner
    pixels = jnp.zeros((2, 32, 32, 3))
    t1 = np.zeros((1, cfg.max_text_len), np.int32)
    t1[0, :5] = [510, 7, 8, 9, 511]
    # same content with extra trailing pad must give the same loss
    loss_a = model.apply(params, pixels[:1], jnp.asarray(t1), method=CaptioningModel.per_sample_loss)
    t2 = t1.copy()
    loss_b = model.apply(params, pixels[:1], jnp.asarray(t2), method=CaptioningModel.per_sample_loss)
    np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b), rtol=1e-6)
    assert np.isfinite(np.asarray(loss_a)).all()


def test_causal_masking(captioner):
    """Changing a later caption token must not change earlier logits."""
    cfg, model, params = captioner
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    toks = rng.integers(1, 500, (1, cfg.max_text_len)).astype(np.int32)
    la = np.asarray(model.apply(params, pixels, jnp.asarray(toks)))
    toks2 = toks.copy()
    toks2[0, 10] = (toks2[0, 10] + 7) % 500
    lb = np.asarray(model.apply(params, pixels, jnp.asarray(toks2)))
    np.testing.assert_allclose(la[0, :10], lb[0, :10], atol=1e-5)
    assert not np.allclose(la[0, 10:], lb[0, 10:])


def test_image_conditioning(captioner):
    cfg, model, params = captioner
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(1, 500, (1, cfg.max_text_len)), jnp.int32)
    pa = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    pb = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    la = np.asarray(model.apply(params, pa, toks))
    lb = np.asarray(model.apply(params, pb, toks))
    assert not np.allclose(la, lb)  # the prefix actually conditions the text


def test_generate_static_shapes(captioner):
    cfg, model, params = captioner
    pixels = jnp.zeros((2, 32, 32, 3))
    out = model.apply(params, pixels, 510, 511, method=CaptioningModel.generate)
    assert out.shape == (2, cfg.max_text_len)
    assert (np.asarray(out)[:, 0] == 510).all()


def test_lora_dense_zero_init_is_identity():
    x = jnp.ones((2, 8))
    base = LoraDense(4, rank=0)
    lora = LoraDense(4, rank=2)
    pb = base.init(jax.random.PRNGKey(0), x)
    pl = lora.init(jax.random.PRNGKey(0), x)
    # lora_b starts at zero -> same output as the base layer
    np.testing.assert_allclose(
        np.asarray(base.apply({"params": {"kernel": pl["params"]["kernel"], "bias": pl["params"]["bias"]}}, x)),
        np.asarray(lora.apply(pl, x)),
        rtol=1e-6,
    )
    assert "lora_a" in pl["params"]


def test_lora_trainable_mask():
    cfg = CaptionerConfig(vocab_size=128, lora_rank=2)
    _, params = init_captioner(cfg, 0)
    mask = lora_trainable_mask(params)
    leaves_with_path = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = [p for p, v in leaves_with_path if v]
    frozen = [p for p, v in leaves_with_path if not v]
    assert any("lora_a" in str(p) for p in trainable)
    assert any("lm_head" in str(p) for p in trainable)
    assert any("visual" in str(p) for p in frozen)
    assert not any("lora" in str(p) for p in frozen)


def test_filter_caption_split():
    train, _, _ = synthetic_captioning(100, data_seed=0, noise_level=0.4)
    scores = train.is_mislabel + np.random.default_rng(0).random(len(train)) * 0.1
    kept = filter_caption_split(train, scores, 60.0)
    assert len(kept) < len(train)
    assert kept.is_mislabel.mean() < train.is_mislabel.mean()  # filter helps


def test_train_captioner_end_to_end(tmp_path):
    train, val, test = synthetic_captioning(80, data_seed=0, noise_level=0.3)
    cfg = CaptionTrainConfig(epochs=2, batch_size=16, es_patience=5)
    res = train_captioner(cfg, {"train": train, "val": val, "test": test}, out_dir=tmp_path)
    assert (tmp_path / "captions.pkl").exists() and (tmp_path / "done").exists()
    assert np.isfinite(res["val_loss_best"])
    assert len(res["generated"]) == len(test)


def test_train_captioner_split_smaller_than_batch(tmp_path):
    """Regression: len(train) < batch_size previously trained for ZERO
    steps (empty range) and silently wrote random-init captions."""
    train, val, test = synthetic_captioning(40, data_seed=1, noise_level=0.3)
    train = train.subset(np.arange(10))  # 10 < batch_size=16
    cfg = CaptionTrainConfig(epochs=2, batch_size=16, es_patience=5)
    res = train_captioner(cfg, {"train": train, "val": val, "test": test}, out_dir=tmp_path)
    assert np.isfinite(res["val_loss_best"])
    assert res["train_loss_final"] is not None and np.isfinite(res["train_loss_final"])


def test_frozen_vision_params_bitstable_under_training():
    """freeze_vision must survive AdamW's decoupled weight decay: the
    optimizer update (not just the gradient) is masked to zero for the
    vision tower (BLIP-2 frozen-encoder contract)."""
    from lemon_tpu.models.qformer import QFormerConfig

    train, val, test = synthetic_captioning(40, data_seed=0, noise_level=0.3)
    mcfg = QFormerConfig.tiny()
    assert mcfg.freeze_vision
    cfg = CaptionTrainConfig(epochs=1, batch_size=16, model_cfg=mcfg,
                             learning_rate=1e-2, weight_decay=0.5)
    model, params0 = init_captioner(mcfg, cfg.seed)
    res = train_captioner(cfg, {"train": train, "val": val, "test": test})
    vis0 = jax.tree_util.tree_leaves(params0["params"]["visual"])
    vis1 = jax.tree_util.tree_leaves(res["params"]["params"]["visual"])
    for a, b in zip(vis0, vis1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the trainable parts did move
    lm0 = jax.tree_util.tree_leaves(params0["params"]["lm_head"])
    lm1 = jax.tree_util.tree_leaves(res["params"]["params"]["lm_head"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(lm0, lm1))


def test_loss_based_detection_scores():
    train, _, _ = synthetic_captioning(60, data_seed=0, noise_level=0.4)
    cfg = CaptionTrainConfig(model_cfg=CaptionerConfig.tiny())
    model, params = init_captioner(cfg.model_cfg, 0)
    losses = per_sample_caption_losses(model, params, train, cfg)
    assert losses.shape == (len(train),)
    assert np.isfinite(losses).all()
