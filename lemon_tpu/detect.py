"""End-to-end LEMoN mislabel detection.

The library core behind ``lemon_tpu.cli.run_lemon`` — the reference's
run_lemon.py pipeline re-architected for TPU:

- **Embed phase**: one jitted program per batch fusing device preprocessing,
  both CLIP towers and L2 normalization (vs. CPU-worker transforms + torch
  forward + per-batch host round-trips, run_lemon.py:136-164).
- **Neighbor phase**: ExactKnnIndex (tiled matmul + on-device top-k; mesh-
  sharded for large comparison sets) replaces CPU FAISS
  (run_lemon.py:166-177).
- **Component extraction**: the reference's per-sample Python loop
  (run_lemon.py:238-307 — its slowest part) becomes one jitted
  gather+einsum per split producing all (N, k) component matrices.
- Same hyperparameter optimization, ablations, outputs (res.pkl with
  {'df', 'agg_results'}, {criteria}_scores.csv, done marker).

Semantics parity notes:
- cosine: neighbor scores negated (D = -similarity) before use
  (run_lemon.py:270,286); euclidean: squared L2 kept as-is.
- train split searches k+1 and drops self per membership in the comparison
  subset (run_lemon.py:257-263).
- comparison subsample of 50k drawn from RandomState(seed) matching the
  reference's global np.random stream (run_lemon.py:122-127).
"""

from __future__ import annotations

import dataclasses
import pickle
import time
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lemon_tpu.data.datasets import CLF_DATASETS, get_dataset
from lemon_tpu.data.labels import LABEL_SETS
from lemon_tpu.knn import ExactKnnIndex, train_split_exclusion
from lemon_tpu.models.encoder import ClipEncoder
from lemon_tpu.models.registry import create_encoder
from lemon_tpu.scoring import (
    NeighborLogs,
    calc_scores,
    eval_metrics,
    maximize_metric,
    unpack_hparams,
)
from lemon_tpu.scoring.optimize import default_grid
from lemon_tpu.scoring.thresholds import optimize_f1_efficient


@dataclasses.dataclass
class DetectionConfig:
    """run_lemon CLI surface (run_lemon.py:34-58), as a typed config."""

    dataset: str = "cifar100"
    noise_type: str = "real"
    noise_level: float = 0.4
    dist_type: str = "cosine"  # 'cosine' | 'euclidean'
    normalize_d1: bool = False
    clip_model: str = "huggingface_clip"
    knn_k: int = 5
    batch_size: int = 128
    seed: int = 0
    data_seed: int = 0
    compr_dataset_size_limit: int = 50000
    ablation: str = "none"
    use_discrete_for_text: bool = False
    real_dataset: bool = False
    custom_cifar_prompt: Optional[str] = None
    subset_val_set: int = -1
    debug: bool = False
    skip_train: bool = False
    skip_hparam_optim: bool = False
    # Evaluate every hparam grid point under the caller's fminbound objective
    # exactly like lib/metrics/utils.py:173-190 (instead of the faster exact
    # device sweep + top-8 re-rank, whose argmax can differ on F1 plateaus).
    strict_hparam_parity: bool = False
    # framework extensions (no reference counterpart)
    synthetic_n: int = 600
    knn_tile: int = 0  # 0 = adaptive tile (knn/index.py:auto_tile)
    # kNN score-matmul precision: 'highest' = full fp32 (FAISS-parity),
    # 'high' = bf16x3 (+41% search throughput, ~3.5e-6 score error,
    # measured 99.9% identical neighbor sets — BENCH_NOTES round 3/4).
    # 'auto' resolves to 'high' for non-strict runs: the round-5 e2e gate
    # (full 20k detection A/B, benchmarks/probe_bf16x3_gate.py) measured
    # max AUROC delta 9.5e-05 vs the 1e-3 parity bar. Strict-parity
    # (golden) runs always stay fp32 — their contract is FAISS-exact.
    knn_precision: str = "auto"
    mesh_shape: Optional[Tuple[int, int]] = None  # (data, model); None = single device
    embedding_cache: Optional[str] = None
    checkpoint: Optional[str] = None
    grid: Optional[Dict] = None


def _resolve_knn_precision(cfg: DetectionConfig) -> str:
    """'auto' -> bf16x3 ('high') for non-strict runs: the round-5 e2e gate
    held the 1e-3 AUROC bar (delta 9.5e-05 on a full 20k detection A/B —
    BENCH_NOTES round 5). Strict-parity (golden) runs always stay fp32
    regardless of the requested mode."""
    if cfg.strict_hparam_parity:
        return "highest"
    if cfg.knn_precision == "auto":
        return "high"
    assert cfg.knn_precision in ("highest", "high"), cfg.knn_precision
    return cfg.knn_precision


def prompt_fn(cfg: DetectionConfig):
    prefix = "A photo of a " if cfg.custom_cifar_prompt is None else cfg.custom_cifar_prompt
    return lambda label: prefix + label


def _is_clf(cfg: DetectionConfig) -> bool:
    return cfg.dataset in CLF_DATASETS or (
        cfg.dataset.startswith("synthetic") and "caption" not in cfg.dataset
    )


def _labels_for(cfg: DetectionConfig):
    if cfg.dataset in LABEL_SETS:
        return LABEL_SETS[cfg.dataset]
    if _is_clf(cfg):
        # synthetic classification: reuse cifar10 names cyclically
        return LABEL_SETS["cifar10"]
    return None


def _texts_for_split(cfg: DetectionConfig, split, label_set) -> Tuple[List[str], List[str], np.ndarray, np.ndarray]:
    """(noisy prompt texts, clean texts, noisy labels, actual labels)."""
    p = prompt_fn(cfg)
    if _is_clf(cfg):
        noisy = split.y_noisy
        clean = split.y_clean
        noisy_texts = [p(label_set[int(i) % len(label_set)]) for i in noisy]
        clean_texts = [label_set[int(i) % len(label_set)] for i in clean]
        return noisy_texts, clean_texts, noisy, clean
    return list(split.sentence), list(split.gold_sentence), split.sentence, split.gold_sentence


@jax.jit
def _components_cosine(img, txt, txt_tr, img_tr, dists_tr, I_n, I_m):
    """All per-example score components in one fused program.

    img/txt: (B, D) query embeddings; txt_tr/img_tr: (N, D) comparison-set
    embeddings (device-resident, shared with the kNN indexes); dists_tr:
    (N,) comparison-set pair-distances; I_n/I_m: (B, k) neighbor ids. The
    neighbor gathers happen INSIDE the program: the former eager
    ``txt_tr[I_n]`` indexing paid a separate tunnel dispatch per gather
    and materialized each (B, k, D) tensor in HBM between dispatches
    (BENCH_NOTES round 4, warm-e2e decomposition)."""
    hp = jax.lax.Precision.HIGHEST
    d1 = 1.0 - jnp.sum(img * txt, axis=1)
    dists_n = 1.0 - jnp.einsum("bd,bkd->bk", txt, txt_tr[I_n], precision=hp)
    dists_m = 1.0 - jnp.einsum("bd,bkd->bk", img, img_tr[I_m], precision=hp)
    return d1, dists_n, dists_m, dists_tr[I_n], dists_tr[I_m]


@jax.jit
def _components_euclidean(img, txt, txt_tr, img_tr, dists_tr, I_n, I_m):
    d1 = jnp.sum((img - txt) ** 2, axis=1)
    dists_n = jnp.sum((txt[:, None, :] - txt_tr[I_n]) ** 2, axis=2)
    dists_m = jnp.sum((img[:, None, :] - img_tr[I_m]) ** 2, axis=2)
    return d1, dists_n, dists_m, dists_tr[I_n], dists_tr[I_m]


def _d1_normalized(cfg: DetectionConfig, img: np.ndarray, label_embs: np.ndarray, noisy_labels: np.ndarray) -> np.ndarray:
    """--normalize_d1: softmax over per-class distances, take the noisy
    class's mass (run_lemon.py:244-248)."""
    from scipy.special import softmax

    if cfg.dist_type == "cosine":
        dists = 1.0 - img @ label_embs.T
    else:
        dists = ((img[:, None, :] - label_embs[None]) ** 2).sum(-1)
    probs = softmax(dists, axis=1)
    return probs[np.arange(len(img)), np.asarray(noisy_labels, np.int64)]


def _cache_kwargs(cfg, encoder, split, texts) -> dict:
    """embed_split cache kwargs: content-addressed key (see
    ClipEncoder.cache_key — hashes rendered texts, image source, weights
    fingerprint, precision; round-1 verdict weak #3: keying on
    dataset/model/seed alone silently reused stale text embeddings across
    noise configs). Shared with the baseline family via the same helper in
    baselines/common.py, so identical (data, weights) embed once per sweep."""
    if cfg.embedding_cache is None:
        return {}
    return dict(
        cache_key=encoder.cache_key(split, texts),
        cache_dir=Path(cfg.embedding_cache),
    )


# Device-resident embedding cache for in-process repeat detections: the
# warm path reads embeddings from the npz cache but still paid the kNN
# index-finalize uploads (2 x ~40 MB for a 20k comparison set) plus one
# ~8 MB pair per scored split, every run — ~1.8 s of the 6.0 s warm 20k
# profile was exactly these relay transfers (BENCH_NOTES round-4
# follow-ups). Keyed on the same content-addressed embed cache_key
# (weights fingerprint + rendered texts + image source + precision), so
# a hit is bit-identical by construction. Bounded to 4 entries (compr +
# val + test + one slack) so a sweep over models/noise configs rotates
# through without accumulating HBM.
_DEV_EMB_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_DEV_EMB_CACHE_MAX = 4


def _device_embs(cache_key: Optional[str], img: np.ndarray, txt: np.ndarray):
    """(img, txt) as device-resident float32 arrays, reused across
    run_detection calls when a content-addressed key is available."""
    key = None if cache_key is None else (cache_key, jax.default_backend())
    hit = _DEV_EMB_CACHE.get(key) if key is not None else None
    if hit is None:
        hit = (
            jnp.asarray(np.ascontiguousarray(img, dtype=np.float32)),
            jnp.asarray(np.ascontiguousarray(txt, dtype=np.float32)),
        )
        if key is not None:
            _DEV_EMB_CACHE[key] = hit
            while len(_DEV_EMB_CACHE) > _DEV_EMB_CACHE_MAX:
                _DEV_EMB_CACHE.popitem(last=False)
    else:
        _DEV_EMB_CACHE.move_to_end(key)
    return hit


def build_neighbor_logs(
    cfg: DetectionConfig,
    encoder: ClipEncoder,
    splits: Dict[str, object],
    label_set,
    mesh=None,
) -> Tuple[NeighborLogs, Dict]:
    """Embed everything, build indexes, extract all score components."""
    k = cfg.knn_k
    train = splits["train"]

    # Comparison subset (<= compr_dataset_size_limit; run_lemon.py:122-127).
    n_train = len(train)
    if n_train > cfg.compr_dataset_size_limit:
        compr_ids = np.random.RandomState(cfg.seed).choice(
            np.arange(n_train), cfg.compr_dataset_size_limit, replace=False
        )
        compr = train.subset(compr_ids)
    else:
        compr_ids = np.arange(n_train)
        compr = train
    in_compr = np.zeros(n_train, bool)
    in_compr[compr_ids] = True

    from lemon_tpu.core.profiling import PhaseTimer

    timer = PhaseTimer()
    compr_texts, _, _, _ = _texts_for_split(cfg, compr, label_set)
    compr_kwargs = _cache_kwargs(cfg, encoder, compr, compr_texts)
    with timer.phase("embed_compr"):
        img_tr, txt_tr = encoder.embed_split(compr, compr_texts, **compr_kwargs)

    metric = "ip" if cfg.dist_type == "cosine" else "l2"
    tile = cfg.knn_tile or None  # 0/None -> adaptive
    knn_prec = _resolve_knn_precision(cfg)
    index_img = ExactKnnIndex(metric=metric, tile=tile, mesh=mesh, precision=knn_prec)
    index_txt = ExactKnnIndex(metric=metric, tile=tile, mesh=mesh, precision=knn_prec)
    if mesh is None:
        # Device-adopted databases: a warm repeat run reuses the cached
        # device arrays and the index-finalize uploads vanish.
        img_tr_dev, txt_tr_dev = _device_embs(compr_kwargs.get("cache_key"), img_tr, txt_tr)
        index_img.add(img_tr_dev)
        index_txt.add(txt_tr_dev)
    else:
        index_img.add(img_tr)
        index_txt.add(txt_tr)
    if cfg.dist_type == "cosine":
        dists_tr = 1.0 - np.sum(txt_tr * img_tr, axis=1)
    else:
        dists_tr = np.sum((txt_tr - img_tr) ** 2, axis=1)
    compr_text_arr = np.asarray(compr_texts)

    # Dataset-label embeddings for --normalize_d1 (run_lemon.py:180-190).
    label_embs = None
    if _is_clf(cfg) and cfg.normalize_d1:
        p = prompt_fn(cfg)
        label_embs = encoder.encode_texts([p(l) for l in label_set])

    # Which splits to score (run_lemon.py:193-196).
    if cfg.debug or cfg.skip_train:
        names = ["val", "test"]
    else:
        names = ["train", "val", "test"]

    rows: List[NeighborLogs] = []
    for sname in names:
        split = splits[sname]
        noisy_texts, clean_texts, noisy_labels, actual_labels = _texts_for_split(cfg, split, label_set)
        split_kwargs = _cache_kwargs(cfg, encoder, split, noisy_texts)
        if sname == "train" and n_train <= cfg.compr_dataset_size_limit:
            img, txt = img_tr, txt_tr  # same transform -> identical embeddings
        else:
            with timer.phase(f"embed_{sname}"):
                img, txt = encoder.embed_split(split, noisy_texts, **split_kwargs)

        extra = 1 if sname == "train" else 0
        with timer.phase("knn_search"):
            # One upload per query matrix, shared between the searches and
            # the components program below (each 8 MB host->device transfer
            # through the tunnel costs ~0.12 s; the old path paid it twice
            # per matrix). The sharded path keeps host arrays — the sharded
            # search fn distributes its own input.
            if mesh is None:
                if img is img_tr:  # train split == comparison set: already up
                    img_q = index_img.device_array()
                    txt_q = index_txt.device_array()
                else:
                    img_q, txt_q = _device_embs(split_kwargs.get("cache_key"), img, txt)
            else:
                img_q, txt_q = img, txt
            D_n, I_n = index_img.search(img_q, k + extra)
            D_m, I_m = index_txt.search(txt_q, k + extra)
        if sname == "train":
            D_n, I_n = train_split_exclusion(D_n, I_n, None, in_compr)
            D_m, I_m = train_split_exclusion(D_m, I_m, None, in_compr)

        with timer.phase("components"):
            fn = _components_cosine if cfg.dist_type == "cosine" else _components_euclidean
            # Chunk over rows: the two (N, k, D) neighbor gathers are the
            # peak-HBM tensors of the whole pipeline (~17 GB for an 80k
            # split at k=51, D=512 — beyond one chip); 16384-row chunks
            # bound them at ~1.7 GB each while keeping the dispatches
            # large. Results are per-row independent, so chunking is
            # exact; static chunk shape = one compile (+ one for the
            # remainder chunk). The comparison-set matrices ride the kNN
            # indexes' own device arrays (uploaded once per detection, at
            # index finalize) rather than a fresh per-split upload.
            chunk = 16384
            if mesh is None:
                txt_tr_dev = index_txt.device_array()
                img_tr_dev = index_img.device_array()
            else:  # sharded indexes keep shard-padded layouts; upload plain
                txt_tr_dev = jnp.asarray(txt_tr)
                img_tr_dev = jnp.asarray(img_tr)
            dists_tr_dev = jnp.asarray(dists_tr)
            parts = []
            for start in range(0, len(img), chunk):
                sl = slice(start, start + chunk)
                parts.append(fn(
                    jnp.asarray(img_q[sl]), jnp.asarray(txt_q[sl]),
                    txt_tr_dev, img_tr_dev, dists_tr_dev,
                    jnp.asarray(I_n[sl]), jnp.asarray(I_m[sl]),
                ))
            d1, dists_n, dists_m, dtr_n, dtr_m = [
                np.concatenate([np.asarray(p[j]) for p in parts]) if len(parts) > 1 else np.asarray(parts[0][j])
                for j in range(5)
            ]

        if cfg.use_discrete_for_text:
            dists_n = 1.0 - (compr_text_arr[I_n] == np.asarray(noisy_texts)[:, None]).astype(np.float64)
        if label_embs is not None:
            d1 = _d1_normalized(cfg, img, label_embs, noisy_labels)

        # cosine: FAISS-style similarities are negated into distances
        # (run_lemon.py:270,286); euclidean keeps squared distances.
        # QUIRK kept deliberately: under --use_discrete_for_text the
        # reference's ``D_n = -D_n`` never executes (it lives inside the
        # non-discrete else-branch, run_lemon.py:266-273), so D_n keeps
        # the RAW search similarity sign in discrete mode while D_m is
        # still negated. Verified against the live reference: ref D_n ==
        # -(negated D_n) exactly on the caption_discrete golden.
        D_n_signed = -D_n if cfg.dist_type == "cosine" and not cfg.use_discrete_for_text else D_n
        D_m_signed = -D_m if cfg.dist_type == "cosine" else D_m

        is_mis = (np.asarray(noisy_texts if not _is_clf(cfg) else noisy_labels) != np.asarray(clean_texts if not _is_clf(cfg) else actual_labels)).astype(np.int64)
        rows.append(
            NeighborLogs(
                d_1=d1,
                dists_n=dists_n,
                D_n=D_n_signed,
                dists_tr_n=dtr_n,
                dists_m=dists_m,
                D_m=D_m_signed,
                dists_tr_m=dtr_m,
                is_mislabel=is_mis,
                sset=np.full(len(split), sname, object),
                idx=np.arange(len(split)),
                noisy_label=np.asarray(noisy_labels),
                actual_label=np.asarray(actual_labels),
                # raw label texts (run_lemon.py:295-297); for captioning
                # these coincide with the labels themselves
                noisy_label_text=np.asarray(
                    [label_set[int(i) % len(label_set)] for i in noisy_labels] if _is_clf(cfg) else noisy_labels, object
                ),
                actual_label_text=np.asarray(clean_texts, object),
            )
        )

    merged = NeighborLogs(
        **{
            f.name: (
                np.concatenate([getattr(r, f.name) for r in rows])
                if getattr(rows[0], f.name) is not None
                else None
            )
            for f in dataclasses.fields(NeighborLogs)
        }
    )
    return merged, timer.as_dict()


ABLATION_FORCE = {
    "none": ((), ()),
    "d1": ((), ("beta",)),
    "tau_1": (("tau_1_n", "tau_1_m"), ()),
    "tau_2": (("tau_2_n", "tau_2_m"), ()),
    "tau_1_2": (("tau_1_n", "tau_1_m", "tau_2_n", "tau_2_m"), ()),
    "beta": (("beta",), ()),
    "gamma": (("gamma",), ()),
    "d1_beta": (("beta",), ("gamma",)),
    "d1_gamma": (("gamma",), ("beta",)),
}

FIXED_ABLATIONS = {
    "only_beta": {"beta": 1, "gamma": 0, "tau_1_n": 0, "tau_2_n": 0, "tau_1_m": 0, "tau_2_m": 0},
    "only_gamma": {"beta": 0, "gamma": 1, "tau_1_n": 0, "tau_2_n": 0, "tau_1_m": 0, "tau_2_m": 0},
}


def select_and_evaluate(cfg: DetectionConfig, logs: NeighborLogs, timer=None) -> Tuple[Dict, "object"]:
    """Hyperparameter selection + per-split evaluation
    (run_lemon.py:319-427). Returns (agg_results, dataframe).
    ``timer``: optional PhaseTimer extended with the hparam/eval stages."""
    from lemon_tpu.core.profiling import PhaseTimer

    timer = timer or PhaseTimer()
    df = logs.to_dataframe()

    if "d1" in cfg.ablation:
        logs = dataclasses.replace(logs, d_1=np.zeros_like(logs.d_1))
        df["d_1"] = 0.0

    if cfg.real_dataset or cfg.skip_hparam_optim:
        return {}, df

    logs_val = logs.split("val")
    criteria = "know_val_labels"
    results: Dict[str, Dict] = {}

    if cfg.ablation in FIXED_ABLATIONS:
        results[criteria] = dict(FIXED_ABLATIONS[cfg.ablation])
    elif cfg.ablation == "multimodal_baseline":
        best_f1, best_thres = optimize_f1_efficient(logs_val.is_mislabel, logs_val.d_1, return_thres=True)
        results[criteria] = {
            "beta": 0, "gamma": 0, "tau_1_n": 0, "tau_2_n": 0, "tau_1_m": 0, "tau_2_m": 0,
            "thres": best_thres, "selected_val": best_f1,
        }
    else:
        force_zero, force_one = ABLATION_FORCE[cfg.ablation]
        best_x, best_f1, best_thres = maximize_metric(
            logs_val,
            grid=cfg.grid if cfg.grid is not None else default_grid(),
            obj_func=optimize_f1_efficient,
            force_zero=force_zero,
            force_one=force_one,
            use_device_grid=not cfg.strict_hparam_parity,
            timer=timer,
        )
        hp = unpack_hparams(best_x, force_zero, force_one)
        results[criteria] = {**hp, "thres": best_thres, "selected_val": best_f1}

    hp = {name: results[criteria].get(name, 0) for name in ("beta", "gamma", "tau_1_n", "tau_2_n", "tau_1_m", "tau_2_m")}
    scores, d_n, d_m = calc_scores(logs, hp, return_components=True)
    df[f"{criteria}_pred_score"] = scores
    df[f"{criteria}_d_n"] = d_n
    df[f"{criteria}_d_m"] = d_m

    val_mask = logs.sset == "val"
    prevalence = logs.is_mislabel[val_mask].sum() / val_mask.sum()
    with timer.phase("eval_metrics"):
        thress = eval_metrics(logs.is_mislabel[val_mask], scores[val_mask], prevalence=prevalence)
        fix = {k: thress[k] for k in ("F1_optimal_thres", "F1_prev_thres", "F1_heuristic_thres")}
        for sname in np.unique(logs.sset):
            mask = logs.sset == sname
            results[criteria][sname] = eval_metrics(
                logs.is_mislabel[mask], scores[mask], prevalence=prevalence, fix_thress=fix
            )
    return results, df


# One-entry encoder cache for in-process repeat runs (the sweep / warm-bench
# regime: same frozen model scored under many hparam/k/seed configs,
# run_lemon.py:112-115 rebuilds it per process). Re-initializing ViT-B/32
# costs seconds per call even with the jitted init cached; the encoder is
# frozen apart from the one-shot int8 activation calibration, whose reuse
# is exactly the documented lazy-calibration contract (core/precision.py).
# Bounded to ONE entry so a multi-model sweep cannot accumulate device
# params; any key change (model, seed, batch, precision, ckpt, mesh)
# rebuilds.
_ENCODER_CACHE: Dict[tuple, ClipEncoder] = {}


def _cached_encoder(cfg: DetectionConfig, mesh) -> ClipEncoder:
    from lemon_tpu.core.precision import default_precision

    key = (
        cfg.clip_model, cfg.seed, cfg.batch_size, cfg.checkpoint,
        cfg.mesh_shape, default_precision(), jax.default_backend(),
    )
    if key not in _ENCODER_CACHE:
        _ENCODER_CACHE.clear()
        _ENCODER_CACHE[key] = create_encoder(
            cfg.clip_model,
            seed=cfg.seed,
            batch_size=cfg.batch_size,
            mesh=mesh,
            checkpoint=cfg.checkpoint,
        )
    return _ENCODER_CACHE[key]


def run_detection(cfg: DetectionConfig, out_dir: Optional[Path] = None) -> Dict:
    """Full pipeline; writes the reference output contract when ``out_dir``
    is given (res.pkl / {criteria}_scores.csv / done)."""
    mesh = None
    if cfg.mesh_shape is not None:
        from lemon_tpu.core.mesh import get_mesh

        mesh = get_mesh(*cfg.mesh_shape)

    if cfg.real_dataset:
        assert cfg.noise_level == 0.0

    splits = dict(
        zip(("train", "val", "test"), get_dataset(
            cfg.dataset, cfg.data_seed, noise_level=cfg.noise_level, noise_type=cfg.noise_type,
            synthetic_n=cfg.synthetic_n,
        ))
    )
    if cfg.subset_val_set > 0:
        rng = np.random.default_rng(cfg.data_seed)
        pick = rng.choice(
            np.arange(len(splits["val"])), min(cfg.subset_val_set, len(splits["val"])), replace=False
        )
        splits["val"] = splits["val"].subset(pick)

    label_set = _labels_for(cfg)
    encoder = _cached_encoder(cfg, mesh)

    t0 = time.time()
    logs, timing = build_neighbor_logs(cfg, encoder, splits, label_set, mesh=mesh)
    from lemon_tpu.core.profiling import PhaseTimer

    sel_timer = PhaseTimer()
    agg, df = select_and_evaluate(cfg, logs, timer=sel_timer)
    timing.update(sel_timer.as_dict())
    total = time.time() - t0
    n = len(logs)
    print(f"Finished {n} samples in {total:.2f} seconds; avg of {total / n:.5f}s per sample")
    print(f"Phase timing: {timing}")

    res = {"df": df} if not agg else {"df": df, "agg_results": agg}
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / "res.pkl", "wb") as f:
            pickle.dump(res, f)
        for criteria in agg:
            cols = df[["sset", "idx", "actual_label", "noisy_label", "is_mislabel", f"{criteria}_pred_score"]]
            cols.rename(columns={f"{criteria}_pred_score": "pred_score"}).to_csv(out_dir / f"{criteria}_scores.csv")
        if cfg.skip_hparam_optim:
            (out_dir / "need_hparam_optim").write_text("need_hparam_optim")
    # In-memory extra only — res.pkl keeps the reference's exact
    # {'df', 'agg_results'} contract (written above, before this key).
    return {**res, "phase_timing": timing}
