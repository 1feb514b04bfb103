"""Downstream filter-then-train classification.

Counterpart of lib/downstream/train_downstream_classification.py:
1. load a detector run's per-example scores (``dists.npy`` or a LEMoN
   ``{criteria}_scores.csv``), drop training examples above a percentile
   (:142-148 — higher score = more likely mislabeled),
2. fine-tune an image classifier on the kept noisy-labeled data with a
   cosine LR schedule and best-val-accuracy early stopping (:150-202),
3. report average and worst-group accuracy (:204-233,
   lib/metrics/utils.py:235-254).

The training loop is one jitted step; batches stream with static shapes.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lemon_tpu.core.io import EarlyStopping
from lemon_tpu.data.datasets import ClassificationSplit, iter_batches, load_images
from lemon_tpu.models.classifier import classification_loss, init_classifier
from lemon_tpu.models.clip import ClipConfig
from lemon_tpu.ops.image import preprocess_device


@dataclasses.dataclass
class DownstreamConfig:
    num_classes: int = 10
    percentile: float = 60.0  # keep scores below this percentile
    epochs: int = 20
    batch_size: int = 128
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    freeze_backbone: bool = False
    es_patience: int = 5
    seed: int = 0
    # ClipConfig | TvResNetSpec | GoogleViTConfig — selects the backbone
    # like get_img_base's name does (lib/models/utils.py:49-61)
    model_cfg: object = dataclasses.field(default_factory=ClipConfig.tiny)


def filter_split(split: ClassificationSplit, scores: np.ndarray, percentile: float) -> ClassificationSplit:
    """Drop rows whose mislabel score exceeds the percentile threshold
    (train_downstream_classification.py:142-148)."""
    assert len(scores) == len(split)
    thres = np.percentile(scores, percentile)
    keep = np.flatnonzero(scores <= thres)
    assert len(keep) > 0, "filter kept nothing"
    return split.subset(keep)


def load_detector_scores(path: Path, split_name: str = "train") -> np.ndarray:
    """Scores from either a baseline's dists.npy(+datasplit.npy) or a LEMoN
    scores CSV (cross-run coupling contract of the reference)."""
    path = Path(path)
    if path.suffix == ".npy":
        dists = np.load(path)
        split_tags = np.load(path.parent / "datasplit.npy", allow_pickle=True)
        return dists[np.asarray(split_tags).ravel() == split_name]
    import pandas as pd

    # run_lemon CSVs carry an unnamed index column; pandas parses it as
    # 'Unnamed: 0' and the named columns come through either way.
    df = pd.read_csv(path)
    if "sset" not in df.columns or "pred_score" not in df.columns:
        raise ValueError(f"{path} is not a detector scores CSV (needs sset/pred_score columns)")
    return df.loc[df.sset == split_name, "pred_score"].to_numpy()


def _predict_split(predict, params, split, batch_size, image_size):
    """(probs, pred_y) over a split with the static-shape batch iterator;
    ``predict`` is a jitted (params, pixels) -> probs function."""
    preds = []
    for idx, n_valid in iter_batches(split, batch_size):
        pixels = preprocess_device(load_images(split, idx, decode_size=image_size), size=image_size)
        preds.append(np.asarray(predict(params, pixels))[:n_valid])
    probs = np.concatenate(preds)
    return probs, probs.argmax(axis=1)


def _epoch_batches(split, batch_size, image_size, rng):
    """Static-shape epoch iterator: the last batch pads by wrapping (also
    when the whole split is smaller than one batch) and reports
    ``n_valid`` so the padded rows can be masked out of the loss — each
    sample then contributes exactly once per epoch, like the reference's
    DataLoader with its ragged final batch."""
    order = rng.permutation(len(split))
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        n_valid = len(idx)
        if n_valid < batch_size:
            idx = np.concatenate([idx, np.resize(order, batch_size - n_valid)])
        images = load_images(split, idx, decode_size=image_size)
        pixels = preprocess_device(images, size=image_size)
        yield pixels, jnp.asarray(split.y_noisy[idx]), n_valid


def train_downstream(
    cfg: DownstreamConfig,
    splits: Dict[str, ClassificationSplit],
    detector_scores: Optional[np.ndarray] = None,
    out_dir: Optional[Path] = None,
) -> Dict:
    train = splits["train"]
    if detector_scores is not None:
        kept = filter_split(train, detector_scores, cfg.percentile)
        print(f"filter: kept {len(kept)}/{len(train)} train examples")
        train = kept

    model, params = init_classifier(cfg.model_cfg, cfg.num_classes, cfg.seed, cfg.freeze_backbone)
    steps_per_epoch = max(len(train) // cfg.batch_size, 1)
    schedule = optax.cosine_decay_schedule(cfg.learning_rate, cfg.epochs * steps_per_epoch)
    tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params["params"])

    @jax.jit
    def train_step(variables, opt_state, pixels, labels, mask):
        # BatchNorm backbones (TvResNetSpec) thread batch_stats through the
        # step (torchvision train() semantics); stateless backbones see an
        # empty aux and pass variables through
        def loss_fn(p):
            if "batch_stats" in variables:
                logits, upd = model.apply(
                    {**variables, "params": p}, pixels, train=True, mutable=["batch_stats"]
                )
            else:
                logits, upd = model.apply({**variables, "params": p}, pixels, train=True), {}
            return classification_loss(logits, labels, mask), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        new_vars = {**variables, **upd, "params": optax.apply_updates(variables["params"], updates)}
        return new_vars, opt_state, loss

    @jax.jit
    def predict(variables, pixels):
        return jax.nn.softmax(model.apply(variables, pixels), axis=-1)

    def eval_split(params, split):
        probs, pred_y = _predict_split(predict, params, split, cfg.batch_size, cfg.model_cfg.image_resolution)
        return probs, pred_y, (pred_y == split.y_clean).mean()

    rng = np.random.default_rng(cfg.seed)
    es = EarlyStopping(patience=cfg.es_patience, mode="max")
    es.seed(-1.0, params)  # any real val_acc beats the placeholder
    t0 = time.time()
    for epoch in range(cfg.epochs):
        losses = []
        for pixels, labels, n_valid in _epoch_batches(train, cfg.batch_size, cfg.model_cfg.image_resolution, rng):
            mask = jnp.arange(len(labels)) < n_valid
            params, opt_state, loss = train_step(params, opt_state, pixels, labels, mask)
            losses.append(float(loss))
            assert np.isfinite(losses[-1])
        _, _, val_acc = eval_split(params, splits["val"])
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} val_acc {val_acc:.4f}")
        es.step(val_acc, params)
        if es.should_stop:
            print(f"early stop at epoch {epoch} (best val_acc {es.best:.4f})")
            break
    best_params = es.best_payload
    runtime = time.time() - t0

    results = {"val_acc_best": es.best, "runtime_s": runtime}
    for sname in ("val", "test"):
        split = splits[sname]
        probs, pred_y, acc = eval_split(best_params, split)
        g = _group_accuracy(pred_y, split.y_clean)
        results[sname] = {
            "accuracy": float(acc),
            "worst_group_accuracy": g["worst_accuracy"],
            "groups": g["group_metrics"],
        }
        if out_dir is not None:
            out_dir = Path(out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            np.save(out_dir / f"{sname}_pred_y.npy", pred_y)
            np.save(out_dir / f"{sname}_probs.npy", probs)
    if out_dir is not None:
        import json

        from flax import serialization

        from lemon_tpu.core.io import json_default

        (Path(out_dir) / "results.json").write_text(json.dumps(results, default=json_default))
        # best-params checkpoint (the reference's ckpt.pth role,
        # train_downstream_classification.py:181) — consumed by the
        # cifar10c inference mode below
        (Path(out_dir) / "ckpt.msgpack").write_bytes(serialization.to_bytes(best_params))
        (Path(out_dir) / "done").write_text("done")
    return results


def _group_accuracy(pred_y: np.ndarray, true_y: np.ndarray) -> Dict:
    """Average / worst-group accuracy over true-class groups
    (lib/metrics/utils.py:235-254 via compute_robustness_cifar10c)."""
    group_stats = {}
    for cls in np.unique(true_y):
        mask = true_y == cls
        group_stats[int(cls)] = {"accuracy": float((pred_y[mask] == cls).mean()), "n": int(mask.sum())}
    return {
        "average_accuracy": float((pred_y == true_y).mean()),
        "worst_accuracy": min(g["accuracy"] for g in group_stats.values()),
        "group_metrics": group_stats,
    }


def evaluate_cifar10c(
    cfg: DownstreamConfig,
    checkpoints,
    corruption_name: str,
    out_dir: Path,
    test_split: Optional[ClassificationSplit] = None,
) -> Dict:
    """Inference-mode robustness eval (the reference's
    ``--dataset cifar10c --num_epochs 0`` branch,
    train_downstream_classification.py:112-114,193-198,355-358): each
    trained checkpoint is evaluated on the corrupted test set; per model
    the prediction npys and a ``results_{corruption}_{model_count}.pkl``
    with average / worst-group accuracy are written. The reference's
    model-loading for this mode is unimplemented (get_trained_models
    raises when no in-memory weights exist, :31-36); here checkpoints are
    the ``ckpt.msgpack`` files train_downstream writes."""
    import pickle

    from flax import serialization

    if test_split is None:
        from lemon_tpu.data.datasets import load_cifar10c

        test_split = load_cifar10c(corruption_name)
    model, params0 = init_classifier(cfg.model_cfg, cfg.num_classes, cfg.seed, cfg.freeze_backbone)

    @jax.jit
    def predict(params, pixels):
        return jax.nn.softmax(model.apply(params, pixels), axis=-1)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    all_results = {}
    for model_count, ckpt in enumerate(checkpoints):
        params = serialization.from_bytes(params0, Path(ckpt).read_bytes())
        _, pred_y = _predict_split(predict, params, test_split, cfg.batch_size, cfg.model_cfg.image_resolution)
        np.save(out_dir / f"test_pred_y_{corruption_name}_{model_count}.npy", pred_y)
        np.save(out_dir / f"test_true_y_{corruption_name}_{model_count}.npy", test_split.y_clean)
        results = _group_accuracy(pred_y, test_split.y_clean)
        with open(out_dir / f"results_{corruption_name}_{model_count}.pkl", "wb") as f:
            pickle.dump(results, f)
        all_results[model_count] = results
    (out_dir / "done").write_text("done")
    return all_results
