"""TPU-native (Flax) judge serving backend (round-2 verdict item 9).

Pins the prompt-conditioned generation path that powers
``run_judges --backend flax``:

- ``Blip2Captioner.generate_judged`` (left-padded prompts, greedy decode,
  transition log-probs) against an HF manual loop on the tiny
  architecturally-real BLIP-2 checkpoint — tokens AND first-transition
  probabilities must match,
- the judge CLI end-to-end on synthetic captions with the flax backend
  (res.pkl/scores.csv/done contract, finite P(No) scores).
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_blip2(tmp_path_factory):
    from transformers import (
        Blip2Config,
        Blip2ForConditionalGeneration,
        Blip2QFormerConfig,
        Blip2VisionConfig,
        OPTConfig,
    )

    torch.manual_seed(3)
    v = Blip2VisionConfig(hidden_size=32, intermediate_size=48, num_hidden_layers=2,
                          num_attention_heads=2, image_size=56, patch_size=14)
    q = Blip2QFormerConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=48, encoder_hidden_size=32,
                           cross_attention_frequency=2, vocab_size=100)
    t = OPTConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2, ffn_dim=48,
                  vocab_size=120, max_position_embeddings=64, word_embed_proj_dim=32)
    cfg = Blip2Config.from_vision_qformer_text_configs(v, q, t, num_query_tokens=4)
    model = Blip2ForConditionalGeneration(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            if (p == 0).all() or p.std() < 1e-8:
                p.add_(torch.randn_like(p) * 0.02)
    out = tmp_path_factory.mktemp("blip2_judge_ckpt")
    model.save_pretrained(out)
    return {"dir": out, "model": model}


def _hf_greedy_with_probs(hf, pixels_nchw, ids, mask, steps):
    """Manual HF loop mirroring generate_judged: left-padded prompt, OPT
    positions from the attention-mask cumsum, greedy, per-step logprob."""
    import torch.nn.functional as F

    with torch.no_grad():
        img = hf.vision_model(pixels_nchw).last_hidden_state
        qout = hf.qformer(query_embeds=hf.query_tokens.expand(img.shape[0], -1, -1),
                          encoder_hidden_states=img).last_hidden_state
        lm_in = hf.language_projection(qout)
        gen_tokens, gen_lps = [], []
        done = torch.zeros(ids.shape[0], dtype=torch.bool)
        pad = hf.config.text_config.pad_token_id
        eos = hf.config.text_config.eos_token_id
        for _ in range(steps):
            txt = hf.language_model.model.decoder.embed_tokens(ids)
            embeds = torch.cat([lm_in, txt], dim=1)
            amask = torch.cat([torch.ones(ids.shape[0], lm_in.shape[1], dtype=mask.dtype), mask], dim=1)
            logits = hf.language_model(inputs_embeds=embeds, attention_mask=amask).logits
            step_logits = logits[:, -1, :]
            lp = F.log_softmax(step_logits.float(), dim=-1)
            nxt = step_logits.argmax(-1)
            chosen = lp.gather(1, nxt[:, None])[:, 0]
            was_done = done.clone()
            nxt = torch.where(was_done, torch.full_like(nxt, pad), nxt)
            chosen = torch.where(was_done, torch.zeros_like(chosen), chosen)
            gen_tokens.append(nxt.clone())
            gen_lps.append(chosen.clone())
            done = was_done | (nxt == eos)
            ids = torch.cat([ids, nxt[:, None]], dim=1)
            # a row generating EOS this step still attends that EOS later;
            # only rows that were ALREADY done append a masked pad
            mask = torch.cat([mask, (1 - was_done.long())[:, None]], dim=1)
    return torch.stack(gen_tokens, 1), torch.stack(gen_lps, 1)


def test_generate_judged_matches_hf_manual_loop(tiny_blip2):
    import jax
    import jax.numpy as jnp

    from lemon_tpu.models.blip2 import Blip2Captioner, load_blip2

    model, params, cfg = load_blip2(tiny_blip2["dir"], max_text_len=12)
    rng = np.random.default_rng(5)
    pixels = rng.random((3, 56, 56, 3), np.float32)
    lp = 8
    ids = np.full((3, lp), cfg.pad_token_id, np.int64)
    mask = np.zeros((3, lp), np.int64)
    for r, n in enumerate((5, 8, 3)):  # ragged left-padded prompts
        ids[r, lp - n] = cfg.bos_token_id
        ids[r, lp - n + 1:] = rng.integers(3, 100, n - 1)
        mask[r, lp - n:] = 1

    steps = 6
    ours_tok, ours_lp = jax.jit(
        lambda p, x, t, m: model.apply(p, x, t, m, steps, method=Blip2Captioner.generate_judged)
    )(params, jnp.asarray(pixels), jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask.astype(np.int32)))

    ref_tok, ref_lp = _hf_greedy_with_probs(
        tiny_blip2["model"],
        torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        torch.from_numpy(ids), torch.from_numpy(mask), steps,
    )
    np.testing.assert_array_equal(np.asarray(ours_tok), ref_tok.numpy())
    np.testing.assert_allclose(np.asarray(ours_lp), ref_lp.numpy(), atol=3e-4, rtol=3e-4)


def test_run_judges_flax_backend_e2e(tiny_blip2, tmp_path):
    from lemon_tpu.cli.run_judges import main as run_judges_main

    out = tmp_path / "flax_judge"
    run_judges_main([
        "--judge", "llava", "--backend", "flax",
        "--vlm_checkpoint", str(tiny_blip2["dir"]),
        "--dataset", "synthetic_caption", "--synthetic_n", "40",
        "--max_new_tokens", "6", "--generate_batch_size", "8",
        "--output_dir", str(out), "--debug",
    ])
    assert (out / "done").exists()
    with open(out / "res.pkl", "rb") as f:
        res = pickle.load(f)
    df = res["df"]
    assert np.isfinite(df["pred_score"].values).all()
    assert ((df["pred_score"].values >= 0) & (df["pred_score"].values <= 1)).all()
