"""Baseline detectors on synthetic data: output contract + detection
signal + scoring-math golden checks."""

import numpy as np
import pytest

from lemon_tpu.baselines.common import BaselineConfig
from lemon_tpu.baselines.clip_sim import run_clip_sim
from lemon_tpu.baselines.deepknn import run_deepknn
from lemon_tpu.baselines.discrepancy import run_discrepancy
from lemon_tpu.baselines.zero_shot import run_zero_shot_logits
from lemon_tpu.scoring.distance_metrics import (
    aum_score,
    datamap_score,
    knn_label_distribution,
    pair_distances,
)


def clf_cfg(**kw):
    return BaselineConfig(
        dataset="synthetic", noise_type="symmetric", noise_level=0.4, clip_model="tiny",
        knn_k=5, batch_size=64, synthetic_n=240, knn_tile=64, **kw,
    )


def caption_cfg(**kw):
    return BaselineConfig(
        dataset="synthetic_caption", noise_type="random", noise_level=0.4, clip_model="tiny",
        knn_k=5, batch_size=64, synthetic_n=240, knn_tile=64, **kw,
    )


def test_pair_distances():
    a = np.array([[1.0, 0.0], [0.0, 2.0]])
    b = np.array([[1.0, 0.0], [0.0, -1.0]])
    np.testing.assert_allclose(pair_distances(a, b, "cosine"), [0.0, 2.0], atol=1e-12)
    np.testing.assert_allclose(pair_distances(a, b, "euclidean"), [0.0, 3.0])
    np.testing.assert_allclose(pair_distances(a, b, "manhattan"), [0.0, 3.0])


def test_aum_and_datamap_scores():
    # 2 epochs, 3 samples, 3 classes
    probs = np.array([
        [[0.8, 0.1, 0.1], [0.2, 0.6, 0.2], [0.1, 0.2, 0.7]],
        [[0.6, 0.2, 0.2], [0.1, 0.8, 0.1], [0.3, 0.3, 0.4]],
    ])
    y = np.array([0, 1, 0])
    aum = aum_score(probs, y)
    # sample 0: margins (0.8-0.1), (0.6-0.2) -> mean 0.55
    assert aum[0] == pytest.approx(0.55)
    # sample 2 has label 0 but class-2 mass: strongly negative margin
    assert aum[2] < 0

    flags, tuples = datamap_score(probs, y)
    assert tuples.shape == (3, 2)
    assert tuples[0, 0] == pytest.approx(0.7)  # mean confidence
    assert flags[2] == 1  # low-confidence low-variability -> flagged


def test_knn_label_distribution_detects_minority_label():
    rng = np.random.default_rng(0)
    # two well-separated clusters; one sample in cluster A carries label B
    a = rng.normal(0, 0.05, (30, 8)) + np.r_[np.ones(4), np.zeros(4)]
    b = rng.normal(0, 0.05, (30, 8)) + np.r_[np.zeros(4), np.ones(4)]
    feats = np.concatenate([a, b]).astype(np.float32)
    labels = np.array([0] * 30 + [1] * 30)
    labels[3] = 1  # mislabeled
    probs = knn_label_distribution(feats, labels, 2, k=5, norm="l1")
    score = 1 - probs[np.arange(60), labels]
    assert np.argmax(score) == 3


@pytest.mark.parametrize("runner,cfg_fn,kw", [
    (run_clip_sim, caption_cfg, {}),
    (run_zero_shot_logits, clf_cfg, {"temperature": 0.07}),
    (run_discrepancy, caption_cfg, {"method": "dis_x"}),
    (run_deepknn, clf_cfg, {}),
])
def test_baseline_runs_and_detects(tmp_path, runner, cfg_fn, kw):
    """Signal-bearing baselines on the concept-codebook mock encoder
    (cross-modal scores need aligned embeddings; the *_x discrepancy scores
    need text-neighborhoods whose images cohere)."""
    from mock_encoder import AlignedMockEncoder

    res = runner(cfg_fn(**kw), tmp_path, encoder=AlignedMockEncoder())
    assert (tmp_path / "res.pkl").exists() and (tmp_path / "done").exists()
    agg = res["agg_results"]
    assert agg["test"]["AUROC"] > 0.55, agg["test"]["AUROC"]
    df = res["df"]
    assert {"sset", "pred_score", "is_mislabel"}.issubset(df.columns)


@pytest.mark.parametrize("method", ["dis_y", "div_y", "div_x"])
def test_text_only_discrepancy_contract(tmp_path, method):
    """dis_y/div_y are text-only and div_* measure *neighborhood* diversity
    rather than query correctness: a swapped caption is still a valid
    caption with a coherent neighborhood, so these hover near chance on
    caption-swap noise — contract checks only."""
    res = run_discrepancy(caption_cfg(method=method), tmp_path)
    assert (tmp_path / "res.pkl").exists()
    assert np.isfinite(res["df"]["pred_score"].to_numpy()).all()
    assert "AUROC" in res["agg_results"]["test"]


def test_zero_shot_temperature_changes_scores(tmp_path):
    from mock_encoder import AlignedMockEncoder

    res_t1 = run_zero_shot_logits(clf_cfg(temperature=1.0), encoder=AlignedMockEncoder())
    res_t001 = run_zero_shot_logits(clf_cfg(temperature=0.01), encoder=AlignedMockEncoder())
    s1 = res_t1["df"]["pred_score"].to_numpy()
    s2 = res_t001["df"]["pred_score"].to_numpy()
    assert not np.allclose(s1, s2)


def test_capfilt_with_proxy_head(tmp_path):
    from mock_encoder import AlignedMockEncoder

    from lemon_tpu.baselines.capfilt import run_capfilt

    res = run_capfilt(caption_cfg(), tmp_path, encoder=AlignedMockEncoder())
    assert (tmp_path / "full_loss_dict.pkl").exists()
    assert res["agg_results"]["test"]["AUROC"] > 0.55


def test_capfilt_hf_blip_itm_end_to_end(tmp_path):
    """The gated HF path runs for real: a tiny architecturally-real
    BLIP-ITM checkpoint (BlipForImageTextRetrieval + BlipProcessor) drives
    hf_blip_itm_scorer through run_capfilt — the reference's
    Salesforce/blip-itm-base-coco role (run_capfilt_baseline.py:35-70)
    exercised end-to-end, not just written."""
    pytest.importorskip("transformers")
    pytest.importorskip("torch")
    from tiny_checkpoints import build_tiny_blip_itm

    from lemon_tpu.baselines.capfilt import run_capfilt

    ckpt = build_tiny_blip_itm(tmp_path / "blip_itm")
    out = tmp_path / "out"
    res = run_capfilt(caption_cfg(itm_checkpoint=ckpt), out)
    assert (out / "full_loss_dict.pkl").exists()
    scores = res["df"]["pred_score"].to_numpy()
    assert np.isfinite(scores).all()
    assert ((scores >= 0) & (scores <= 1)).all()
    assert len(np.unique(scores)) > 1  # real per-pair ITM softmax probs


def test_capfilt_custom_scorer():
    from lemon_tpu.baselines.capfilt import run_capfilt

    def oracle_itm(images, captions):
        # scripted scorer: long captions 'match' (arbitrary but deterministic)
        return np.array([min(len(c) / 40.0, 1.0) for c in captions])

    res = run_capfilt(caption_cfg(), itm_score_fn=oracle_itm)
    assert np.isfinite(res["df"]["pred_score"]).all()


def test_embedding_cache_shared_across_pipelines(tmp_path):
    """The cache key is pure content (texts + image source + weights +
    precision), so a baseline and a run_lemon detection over the same
    splits with the same encoder reuse each other's entries — the sweep-
    level shared cache dir dedupes embedding across the whole job family."""
    from lemon_tpu.detect import DetectionConfig, run_detection

    cache = tmp_path / "cache"
    cfg = caption_cfg(embedding_cache=str(cache), data_seed=3)
    run_clip_sim(cfg, tmp_path / "sim")
    files = sorted(cache.glob("emb_*.npz"))
    assert len(files) == 3  # train / val / test
    mtimes = {f: f.stat().st_mtime for f in files}

    det = DetectionConfig(
        dataset="synthetic_caption", noise_type="random", noise_level=0.4,
        clip_model="tiny", knn_k=3, batch_size=64, synthetic_n=240,
        knn_tile=64, data_seed=3, embedding_cache=str(cache),
        grid={"beta": [0, 5], "gamma": [0, 5], "tau_1": [0, 5], "tau_2": [0, 5]},
    )
    res = run_detection(det)
    # detection embedded compr(=train)/val/test — all cache hits, no new
    # entries, nothing rewritten
    files_after = sorted(cache.glob("emb_*.npz"))
    assert files_after == files
    assert {f: f.stat().st_mtime for f in files_after} == mtimes
    assert np.isfinite(res["df"]["know_val_labels_pred_score"].to_numpy()).all()
