"""BERT text tower parity vs transformers.BertModel (random init, tiny)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lemon_tpu.models.bert_text import BertTextConfig, BertTextTower, bert_params_from_hf

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def pair():
    cfg = BertTextConfig.tiny()
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items() if "position_ids" not in k}
    params = bert_params_from_hf(sd, cfg)
    return cfg, hf, params


def test_encoder_parity_cls_hidden(pair):
    cfg, hf, params = pair
    # use a linear identity projection so we can compare the CLS hidden
    import dataclasses

    cfg_lin = dataclasses.replace(cfg, projection="linear", embed_dim=cfg.hidden_size)
    params = dict(params)
    params["params"] = dict(params["params"])
    params["params"]["proj"] = {"kernel": np.eye(cfg.hidden_size, dtype=np.float32)}
    model = BertTextTower(cfg_lin)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, cfg.vocab_size, (3, 16)).astype(np.int64)
    tokens[:, 10:] = 0  # padding
    mask = (tokens != 0).astype(np.int64)

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(tokens), attention_mask=torch.from_numpy(mask)).last_hidden_state[:, 0, :].numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_mlp_projection_and_mean_pooling(pair):
    cfg, _, params = pair
    import dataclasses

    import jax

    model = BertTextTower(cfg)  # mlp projection, cls pooling
    init = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))
    # converter params merge with head init
    merged = {"params": {**init["params"], **params["params"]}}
    out = model.apply(merged, jnp.asarray(np.random.default_rng(1).integers(1, 200, (2, 16))))
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()

    cfg_mean = dataclasses.replace(cfg, pooling="mean")
    model_m = BertTextTower(cfg_mean)
    out_m = model_m.apply(merged, jnp.asarray(np.random.default_rng(1).integers(1, 200, (2, 16))))
    assert not np.allclose(np.asarray(out), np.asarray(out_m))
