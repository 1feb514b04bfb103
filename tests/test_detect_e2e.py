"""End-to-end detection pipeline tests on synthetic data (SURVEY.md §4 plan
item 4 analog: e2e with the full output contract)."""

import pickle

import numpy as np
import pytest

from lemon_tpu.detect import DetectionConfig, run_detection
from lemon_tpu.scoring.lemon import NeighborLogs

SMALL_GRID = {"beta": [0, 5, 20], "gamma": [0, 5, 20], "tau_1": [0, 5], "tau_2": [0, 5]}


@pytest.fixture(scope="module")
def caption_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("lemon_caption")
    cfg = DetectionConfig(
        dataset="synthetic_caption",
        noise_type="random",
        noise_level=0.4,
        clip_model="tiny",
        knn_k=5,
        batch_size=64,
        synthetic_n=300,
        knn_tile=64,
        grid=SMALL_GRID,
    )
    res = run_detection(cfg, out)
    return cfg, out, res


def test_output_contract(caption_run):
    cfg, out, res = caption_run
    assert (out / "res.pkl").exists()
    assert (out / "know_val_labels_scores.csv").exists()
    loaded = pickle.load(open(out / "res.pkl", "rb"))
    assert set(loaded.keys()) == {"df", "agg_results"}
    df = loaded["df"]
    for col in ("sset", "idx", "is_mislabel", "d_1", "dists_n", "D_n", "dists_tr_n", "dists_m", "D_m", "dists_tr_m", "know_val_labels_pred_score"):
        assert col in df.columns, col
    assert set(df.sset.unique()) == {"train", "val", "test"}
    # round-trip through the reference-compatible frame
    logs = NeighborLogs.from_dataframe(df)
    assert logs.k == cfg.knn_k


def test_detection_quality(caption_run):
    _, _, res = caption_run
    agg = res["agg_results"]["know_val_labels"]
    # Synthetic templates + random tiny encoder: the neighbor signal alone
    # must give decisively-better-than-chance detection.
    assert agg["val"]["AUROC"] > 0.7
    assert agg["test"]["AUROC"] > 0.7
    for field in ("beta", "gamma", "thres", "selected_val"):
        assert field in agg


def test_train_split_scored(caption_run):
    _, _, res = caption_run
    df = res["df"]
    n_train = (df.sset == "train").sum()
    assert n_train == 240
    # self-exclusion: a train row's neighbor distance must not be ~0
    train_D = np.stack(df.loc[df.sset == "train", "D_n"].to_list())
    assert (train_D[:, 0] > -0.9999).all()  # cosine: D_n = -similarity


def test_classification_dataset_ablations(tmp_path):
    base = dict(
        dataset="synthetic", noise_type="symmetric", noise_level=0.4, clip_model="tiny",
        knn_k=3, batch_size=64, synthetic_n=200, knn_tile=64, grid=SMALL_GRID,
    )
    res = run_detection(DetectionConfig(**base, ablation="only_beta"))
    agg = res["agg_results"]["know_val_labels"]
    assert agg["beta"] == 1 and agg["gamma"] == 0

    res = run_detection(DetectionConfig(**base, ablation="multimodal_baseline"))
    agg = res["agg_results"]["know_val_labels"]
    assert agg["beta"] == 0 and agg["gamma"] == 0 and "thres" in agg

    res = run_detection(DetectionConfig(**base, ablation="gamma"))
    agg = res["agg_results"]["know_val_labels"]
    assert agg["gamma"] == 0.0


def test_skip_hparam_optim(tmp_path):
    cfg = DetectionConfig(
        dataset="synthetic_caption", noise_type="random", clip_model="tiny",
        knn_k=3, batch_size=64, synthetic_n=150, knn_tile=64, skip_hparam_optim=True,
    )
    res = run_detection(cfg, tmp_path)
    assert set(res.keys()) == {"df", "phase_timing"}  # no agg_results when optim skipped
    assert (tmp_path / "need_hparam_optim").exists()


def test_euclidean_dist_type():
    cfg = DetectionConfig(
        dataset="synthetic_caption", noise_type="random", clip_model="tiny", dist_type="euclidean",
        knn_k=3, batch_size=64, synthetic_n=150, knn_tile=64, grid=SMALL_GRID, skip_train=True,
    )
    res = run_detection(cfg)
    agg = res["agg_results"]["know_val_labels"]
    assert agg["test"]["AUROC"] > 0.6
    df = res["df"]
    assert set(df.sset.unique()) == {"val", "test"}  # skip_train honored
    # euclidean D_n are squared distances (non-negative)
    assert (np.stack(df["D_n"].to_list()) >= 0).all()


def test_embedding_cache_roundtrip(tmp_path):
    """Second run with the same cache key must reuse embeddings and produce
    identical scores (the capability upgrade noted in SURVEY.md §5)."""
    cfg = DetectionConfig(
        dataset="synthetic_caption", noise_type="random", clip_model="tiny",
        knn_k=3, batch_size=64, synthetic_n=120, knn_tile=32, grid=SMALL_GRID,
        skip_train=True, embedding_cache=str(tmp_path / "cache"),
    )
    res1 = run_detection(cfg)
    cache_files = list((tmp_path / "cache").glob("emb_*.npz"))
    assert cache_files, "cache not written"
    mtimes = {f: f.stat().st_mtime for f in cache_files}
    res2 = run_detection(cfg)
    assert {f: f.stat().st_mtime for f in cache_files} == mtimes  # reused
    np.testing.assert_allclose(
        res1["df"]["know_val_labels_pred_score"].to_numpy(),
        res2["df"]["know_val_labels_pred_score"].to_numpy(),
        rtol=1e-6,
    )


def test_embedding_cache_keys_on_noise_config(tmp_path):
    """Two runs differing only in noise_level sharing a cache dir must NOT
    reuse each other's text embeddings (round-1 verdict weak #3: the old key
    ignored the noise config, silently producing wrong scores)."""
    base = dict(
        dataset="synthetic_caption", noise_type="random", clip_model="tiny",
        knn_k=3, batch_size=64, synthetic_n=120, knn_tile=32, grid=SMALL_GRID,
        skip_train=True, embedding_cache=str(tmp_path / "cache"),
    )
    res_low = run_detection(DetectionConfig(**base, noise_level=0.1))
    n_files_low = len(list((tmp_path / "cache").glob("emb_*.npz")))
    res_high = run_detection(DetectionConfig(**base, noise_level=0.6))
    n_files_high = len(list((tmp_path / "cache").glob("emb_*.npz")))
    assert n_files_high > n_files_low, "second noise level hit the first's cache entries"
    # and a fresh cacheless run at noise 0.6 agrees with the cached one
    res_ref = run_detection(DetectionConfig(**{**base, "embedding_cache": None}, noise_level=0.6))
    np.testing.assert_allclose(
        res_high["df"]["know_val_labels_pred_score"].to_numpy(),
        res_ref["df"]["know_val_labels_pred_score"].to_numpy(),
        rtol=1e-6,
    )
    assert not np.allclose(
        res_low["df"]["is_mislabel"].to_numpy(), res_high["df"]["is_mislabel"].to_numpy()
    )


def test_embedding_cache_corrupt_entry_is_miss(tmp_path):
    """A torn/corrupt cache file (crashed writer, pre-atomic-write runs)
    must be treated as a miss and rewritten, not crash the run — sweep jobs
    share one cache dir."""
    cfg = DetectionConfig(
        dataset="synthetic_caption", noise_type="random", clip_model="tiny",
        knn_k=3, batch_size=64, synthetic_n=120, knn_tile=32, grid=SMALL_GRID,
        skip_train=True, embedding_cache=str(tmp_path / "cache"),
    )
    res1 = run_detection(cfg)
    cache_files = list((tmp_path / "cache").glob("emb_*.npz"))
    assert cache_files
    for f in cache_files:
        f.write_bytes(b"not a zipfile")
    res2 = run_detection(cfg)  # re-embeds, rewrites
    np.testing.assert_allclose(
        res1["df"]["know_val_labels_pred_score"].to_numpy(),
        res2["df"]["know_val_labels_pred_score"].to_numpy(),
        rtol=1e-6,
    )
    for f in cache_files:
        np.load(f)  # readable again
    # no temp files left behind by the atomic publish
    assert not list((tmp_path / "cache").glob("*.tmp.npz"))


def test_subset_val_set(tmp_path):
    """--subset_val_set subsamples validation deterministically
    (run_lemon.py:108-110)."""
    cfg = DetectionConfig(
        dataset="synthetic_caption", noise_type="random", clip_model="tiny",
        knn_k=3, batch_size=64, synthetic_n=200, knn_tile=64, grid=SMALL_GRID,
        skip_train=True, subset_val_set=10,
    )
    res = run_detection(cfg)
    df = res["df"]
    assert (df.sset == "val").sum() == 10
    # determinism via data_seed
    res2 = run_detection(cfg)
    np.testing.assert_array_equal(
        df.loc[df.sset == "val", "idx"].to_numpy(),
        res2["df"].loc[res2["df"].sset == "val", "idx"].to_numpy(),
    )


def test_embedding_cache_keys_on_precision(tmp_path, monkeypatch):
    """fp32 and bf16 runs sharing a cache dir must not reuse each other's
    embeddings (the numerics differ; the key folds in the Precision)."""
    base = dict(
        dataset="synthetic_caption", noise_type="random", noise_level=0.4,
        clip_model="tiny", knn_k=3, batch_size=64, synthetic_n=120,
        knn_tile=32, grid=SMALL_GRID, skip_train=True,
        embedding_cache=str(tmp_path / "cache"),
    )
    run_detection(DetectionConfig(**base))
    n_fp32 = len(list((tmp_path / "cache").glob("emb_*.npz")))
    monkeypatch.setenv("LEMON_TPU_PRECISION", "bf16")
    run_detection(DetectionConfig(**base))
    n_both = len(list((tmp_path / "cache").glob("emb_*.npz")))
    assert n_both > n_fp32, "bf16 run reused the fp32 cache entries"


def test_knn_precision_resolution():
    """'auto' resolves to bf16x3 for non-strict runs (the round-5 e2e gate
    measured AUROC delta 9.5e-05 vs the 1e-3 bar); golden (strict-parity)
    runs are pinned to FAISS-exact fp32 whatever the requested mode."""
    from lemon_tpu.detect import _resolve_knn_precision

    assert _resolve_knn_precision(DetectionConfig(knn_precision="highest")) == "highest"
    assert _resolve_knn_precision(DetectionConfig(knn_precision="high")) == "high"
    assert _resolve_knn_precision(DetectionConfig(knn_precision="auto")) == "high"
    for mode in ("auto", "high", "highest"):
        assert _resolve_knn_precision(
            DetectionConfig(knn_precision=mode, strict_hparam_parity=True)
        ) == "highest"


def test_knn_precision_high_cpu_identical(caption_run, tmp_path):
    """precision='high' swaps the neighbor-id reconstruction to the one-hot
    path (knn/index.py); on CPU the matmul precision hint itself is a
    no-op, so the whole detection result must be IDENTICAL — any diff
    would implicate the gather/select path, not bf16x3 rounding."""
    cfg, _, res = caption_run
    import dataclasses

    cfg_h = dataclasses.replace(cfg, knn_precision="high")
    res_h = run_detection(cfg_h, tmp_path)
    agg, agg_h = res["agg_results"], res_h["agg_results"]
    for crit in agg:
        for split in ("val", "test"):
            assert agg_h[crit][split]["AUROC"] == pytest.approx(
                agg[crit][split]["AUROC"], abs=1e-12
            )
    col = "know_val_labels_pred_score"
    np.testing.assert_allclose(
        res_h["df"][col].to_numpy(), res["df"][col].to_numpy(), rtol=0, atol=1e-6
    )


def test_device_embedding_cache_repeat_run(tmp_path):
    """In-process repeat detections with an embedding cache reuse the
    device-resident embedding arrays (the round-5 warm-path lever: index
    finalize re-uploads vanish). The cache must be populated, bounded,
    keyed content-addressed — and the repeat result bit-identical."""
    import dataclasses

    from lemon_tpu import detect as detect_mod

    cfg = DetectionConfig(
        dataset="synthetic_caption",
        noise_type="random",
        noise_level=0.4,
        clip_model="tiny",
        knn_k=5,
        batch_size=64,
        synthetic_n=240,
        grid=SMALL_GRID,
        embedding_cache=str(tmp_path / "emb"),
    )
    detect_mod._DEV_EMB_CACHE.clear()
    res1 = run_detection(cfg, tmp_path / "o1")
    keys_after_first = set(detect_mod._DEV_EMB_CACHE)
    assert keys_after_first, "device-embedding cache not populated"
    assert len(keys_after_first) <= detect_mod._DEV_EMB_CACHE_MAX
    cached_ids = {id(a) for pair in detect_mod._DEV_EMB_CACHE.values() for a in pair}
    res2 = run_detection(cfg, tmp_path / "o2")
    # same keys (no churn), same arrays (reuse, not re-upload)
    assert set(detect_mod._DEV_EMB_CACHE) == keys_after_first
    assert {id(a) for pair in detect_mod._DEV_EMB_CACHE.values() for a in pair} == cached_ids
    col = "know_val_labels_pred_score"
    np.testing.assert_array_equal(
        res1["df"][col].to_numpy(), res2["df"][col].to_numpy()
    )
    for crit, splits in res1["agg_results"].items():
        for split in ("val", "test"):
            assert res2["agg_results"][crit][split]["AUROC"] == splits[split]["AUROC"]
