"""Flax CLIP tower parity vs transformers.CLIPModel (SURVEY.md §4 plan item 3).

A randomly initialized HF CLIPModel (tiny config — no network needed) is
converted through the loader; encode_image/encode_text must match the HF
get_image_features/get_text_features to fp32 tolerance. This validates the
architecture + weight mapping, so real checkpoints load correctly when
available.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lemon_tpu.models.clip import ClipConfig, ClipModel
from lemon_tpu.models.loader import detect_and_convert, from_openai_state_dict

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def tiny_hf_clip():
    cfg = transformers.CLIPConfig(
        # num_attention_heads follows the OpenAI CLIP convention
        # heads == width // 64, which the loader's config inference assumes
        # (as does the reference's build_model, chexzero_clip.py:440-446).
        text_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 1,
            "max_position_embeddings": 16,
            "vocab_size": 1000,
            "hidden_act": "quick_gelu",
            # transformers pools at the *eos token id* (not argmax); our
            # argmax pooling is equivalent iff EOT is the max id, as in
            # real CLIP vocabularies (49407). Mirror that here with 999.
            "bos_token_id": 998,
            "eos_token_id": 999,
        },
        vision_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 1,
            "image_size": 32,
            "patch_size": 16,
            "hidden_act": "quick_gelu",
        },
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def converted():
    hf = tiny_hf_clip()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd = {k: v for k, v in sd.items() if "position_ids" not in k}
    params, cfg = detect_and_convert(sd)
    model = ClipModel(cfg)
    return hf, model, params, cfg


def test_config_inference(converted):
    _, _, _, cfg = converted
    assert cfg.embed_dim == 32
    assert cfg.vision_width == 64 and cfg.vision_patch_size == 16
    assert cfg.image_resolution == 32
    assert cfg.text_layers == 2 and cfg.vision_layers == 2
    assert cfg.vocab_size == 1000 and cfg.context_length == 16


def test_image_tower_parity(converted):
    hf, model, params, cfg = converted
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref = hf.get_image_features(torch.from_numpy(pixels.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(pixels), method=ClipModel.encode_image))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_text_tower_parity(converted):
    hf, model, params, cfg = converted
    rng = np.random.default_rng(1)
    # ids below vocab, EOT (= max id in our pooling convention) at a
    # per-row position, zero padding after.
    b, l = 4, 16
    tokens = rng.integers(1, 900, size=(b, l)).astype(np.int64)
    eot = 999
    for i, pos in enumerate([5, 9, 15, 12]):
        tokens[i, pos] = eot
        tokens[i, pos + 1 :] = 0
        tokens[i, 0] = 998  # SOT stand-in below EOT id

    attn = (tokens != 0).astype(np.int64)
    with torch.no_grad():
        ref = hf.get_text_features(
            input_ids=torch.from_numpy(tokens), attention_mask=torch.from_numpy(attn)
        ).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), method=ClipModel.encode_text))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_forward_logits_parity(converted):
    hf, model, params, cfg = converted
    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 900, size=(2, 16)).astype(np.int64)
    tokens[:, -1] = 999

    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(tokens),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            attention_mask=torch.ones(2, 16, dtype=torch.long),
        )
        ref = out.logits_per_image.numpy()
    ours, ours_t = model.apply(params, jnp.asarray(pixels), jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_t), ref.T, rtol=1e-4, atol=1e-4)


def test_openai_state_dict_roundtrip():
    """OpenAI-format (fused in_proj) conversion yields the same params as the
    equivalent HF layout."""
    hf = tiny_hf_clip()
    sd_hf = {k: v.detach().numpy() for k, v in hf.state_dict().items() if "position_ids" not in k}
    params_hf, cfg = detect_and_convert(sd_hf)

    # Build the OpenAI layout from the HF tensors.
    sd_oa = {
        "visual.conv1.weight": sd_hf["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding": sd_hf["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding": sd_hf["vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": sd_hf["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd_hf["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": sd_hf["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": sd_hf["vision_model.post_layernorm.bias"],
        "visual.proj": sd_hf["visual_projection.weight"].T,
        "token_embedding.weight": sd_hf["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd_hf["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd_hf["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd_hf["text_model.final_layer_norm.bias"],
        "text_projection": sd_hf["text_projection.weight"].T,
        "logit_scale": sd_hf["logit_scale"],
    }
    for tower, prefix in [("vision_model", "visual.transformer"), ("text_model", "transformer")]:
        for i in range(2):
            src = f"{tower}.encoder.layers.{i}"
            dst = f"{prefix}.resblocks.{i}"
            sd_oa[f"{dst}.attn.in_proj_weight"] = np.concatenate(
                [sd_hf[f"{src}.self_attn.{p}_proj.weight"] for p in "qkv"], axis=0
            )
            sd_oa[f"{dst}.attn.in_proj_bias"] = np.concatenate(
                [sd_hf[f"{src}.self_attn.{p}_proj.bias"] for p in "qkv"]
            )
            for a, b in [
                ("attn.out_proj.weight", "self_attn.out_proj.weight"),
                ("attn.out_proj.bias", "self_attn.out_proj.bias"),
                ("ln_1.weight", "layer_norm1.weight"),
                ("ln_1.bias", "layer_norm1.bias"),
                ("ln_2.weight", "layer_norm2.weight"),
                ("ln_2.bias", "layer_norm2.bias"),
                ("mlp.c_fc.weight", "mlp.fc1.weight"),
                ("mlp.c_fc.bias", "mlp.fc1.bias"),
                ("mlp.c_proj.weight", "mlp.fc2.weight"),
                ("mlp.c_proj.bias", "mlp.fc2.bias"),
            ]:
                sd_oa[f"{dst}.{a}"] = sd_hf[f"{src}.{b}"]

    params_oa, cfg_oa = from_openai_state_dict(sd_oa)
    assert cfg_oa.vision_layers == cfg.vision_layers

    import jax

    flat_hf = jax.tree_util.tree_leaves_with_path(params_hf)
    flat_oa = jax.tree_util.tree_leaves_with_path(params_oa)
    assert len(flat_hf) == len(flat_oa)
    for (p1, a), (p2, b) in zip(sorted(flat_hf, key=lambda x: str(x[0])), sorted(flat_oa, key=lambda x: str(x[0]))):
        assert str(p1) == str(p2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))


def test_fold_ln_matches_standard_path():
    """The folded-LN fast path (ln_folded_dense) is algebraically identical
    to Dense(FpLayerNorm(x)) and produces the same param tree."""
    import dataclasses

    import jax.tree_util as jtu

    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params

    cfg = ClipConfig.tiny()
    model, params = init_params(cfg, seed=0, precision=Precision.fp32())
    pfold = dataclasses.replace(Precision.fp32(), fold_ln=True)
    model_f = ClipModel(cfg, precision=pfold)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    tk = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (4, 16)).astype(np.int32))
    e0 = model.apply(params, px, method=ClipModel.encode_image)
    e1 = model_f.apply(params, px, method=ClipModel.encode_image)
    t0 = model.apply(params, tk, method=ClipModel.encode_text)
    t1 = model_f.apply(params, tk, method=ClipModel.encode_text)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-4, atol=1e-5)
    _, p2 = init_params(cfg, seed=0, precision=pfold)
    s1 = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(params)}
    s2 = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(p2)}
    assert s1 == s2


@pytest.mark.parametrize("batch", [4, 5])  # 4 packs (pack=2), 5 falls back
def test_pool_last_block_matches_full_path(batch):
    """pool_last_block computes only the CLS/EOT rows through the final
    block — bitwise the same math per row, so embeddings match the full
    path to float tolerance for packed and unpacked batches, with EOT
    positions varying per sequence."""
    import dataclasses as dc

    from lemon_tpu.core.precision import Precision
    from lemon_tpu.models.clip import init_params

    cfg = dc.replace(ClipConfig.tiny(), pool_last_block_text=True)
    assert cfg.pool_last_block
    # pooling is gated on Precision (fast path only); force it on here so
    # the fp32 comparison isolates the row-restriction math (text pooling
    # additionally needs the config opt-in — perf-off by default)
    ppool = dc.replace(Precision.fp32(), pool_last_block=True)
    model, params = init_params(cfg, seed=0, precision=ppool)
    model_full = ClipModel(cfg, precision=Precision.fp32())

    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.standard_normal((batch, 32, 32, 3)).astype(np.float32))
    tk = rng.integers(1, cfg.vocab_size - 2, (batch, 16)).astype(np.int32)
    # ragged EOT positions (zero-pad after EOT like the tokenizer does)
    for i, eot in enumerate(rng.integers(3, 16, batch)):
        tk[i, eot:] = 0
        tk[i, eot] = cfg.vocab_size - 1
    tk = jnp.asarray(tk)

    e0 = model_full.apply(params, px, method=ClipModel.encode_image)
    e1 = model.apply(params, px, method=ClipModel.encode_image)
    t0 = model_full.apply(params, tk, method=ClipModel.encode_text)
    t1 = model.apply(params, tk, method=ClipModel.encode_text)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-5, atol=1e-5)
    # return_tokens (captioner prefix) keeps the full token states
    toks = model.apply(
        params, px, method=lambda m, p: m.visual(p, return_tokens=True)
    )
    assert toks.shape[1] == cfg.grid ** 2 + 1
