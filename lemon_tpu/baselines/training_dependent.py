"""Training-dynamics baselines: AUM and Datamaps.

Counterpart of lib/baselines/training_dependent_baselines.py:150-254 +
lib/metrics/distance_metrics.py:93-172: train a supervised classifier on
the *noisy* labels of each split (including test — intentional: these
baselines score exactly the examples they train on), record the per-epoch
softmax probabilities, then

- AUM score  = mean over epochs of margin(assigned label)  [low -> mislabel]
- Datamap    = (mean confidence, variability) of P(assigned label)

Differences from the reference: the per-epoch probabilities are recorded
from the same jitted forward used for training (no separate eval pass per
batch), and scores are computed inline (the reference defers to notebook
aggregation of {phase}_epoch_{i}.pkl files, which we also write).
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lemon_tpu.baselines.common import BaselineConfig, evaluate_scores, split_frame
from lemon_tpu.data.datasets import get_dataset, iter_batches, load_images
from lemon_tpu.models.classifier import classification_loss, init_classifier
from lemon_tpu.models.clip import ClipConfig
from lemon_tpu.ops.image import preprocess_device


def run_training_dependent(
    cfg: BaselineConfig,
    out_dir: Optional[Path] = None,
    splits=None,
    epochs: int = 10,
    lr: float = 1e-3,
    momentum: float = 0.9,
    model_cfg: Optional[ClipConfig] = None,
) -> Dict:
    assert cfg.method in ("aum", "datamap"), cfg.method
    if splits is None:
        splits = dict(
            zip(("train", "val", "test"), get_dataset(
                cfg.dataset, cfg.data_seed, noise_level=cfg.noise_level,
                noise_type=cfg.noise_type, synthetic_n=cfg.synthetic_n,
            ))
        )
    from lemon_tpu.detect import _labels_for

    label_set = _labels_for(cfg)
    n_classes = len(label_set)
    model_cfg = model_cfg or ClipConfig.tiny()

    model, params = init_classifier(model_cfg, n_classes, cfg.seed)
    tx = optax.sgd(lr, momentum=momentum)
    opt_state = tx.init(params["params"])

    @jax.jit
    def train_step(variables, opt_state, pixels, labels, mask):
        def loss_fn(p):
            # masked mean: iter_batches pads the final batch by repeating
            # rows — unmasked they would contribute extra gradient weight
            # (the reference's DataLoader sees each sample exactly once).
            # BatchNorm backbones (resnet50) thread batch_stats through.
            if "batch_stats" in variables:
                logits, upd = model.apply(
                    {**variables, "params": p}, pixels, train=True, mutable=["batch_stats"]
                )
            else:
                logits, upd = model.apply({**variables, "params": p}, pixels, train=True), {}
            return classification_loss(logits, labels, mask), (logits, upd)

        (loss, (logits, upd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        new_vars = {**variables, **upd, "params": optax.apply_updates(variables["params"], updates)}
        return new_vars, opt_state, loss, jax.nn.softmax(logits, -1)

    probs_by_phase = {s: [] for s in ("train", "val", "test")}
    t0 = time.time()
    for epoch in range(epochs):
        for phase in ("train", "val", "test"):
            split = splits[phase]
            epoch_probs = np.zeros((len(split), n_classes), np.float32)
            for idx, n_valid in iter_batches(split, cfg.batch_size):
                pixels = preprocess_device(load_images(split, idx, decode_size=model_cfg.image_resolution), size=model_cfg.image_resolution)
                labels = jnp.asarray(split.y_noisy[idx] % n_classes)
                mask = jnp.arange(len(idx)) < n_valid
                params, opt_state, loss, probs = train_step(params, opt_state, pixels, labels, mask)
                assert np.isfinite(float(loss))
                epoch_probs[idx[:n_valid]] = np.asarray(probs)[:n_valid]
            probs_by_phase[phase].append(epoch_probs)
            if out_dir is not None and phase != "train":
                out_dir = Path(out_dir)
                out_dir.mkdir(parents=True, exist_ok=True)
                with open(out_dir / f"{phase}_epoch_{epoch}.pkl", "wb") as f:
                    pickle.dump({"prediction": epoch_probs, "true_class": split.y_noisy,
                                 "label_flips": split.is_mislabel}, f)
    runtime = time.time() - t0

    from lemon_tpu.scoring.distance_metrics import aum_score, datamap_score

    scores = {}
    for phase in ("train", "val", "test"):
        stack = np.stack(probs_by_phase[phase])  # (E, N, C)
        y = splits[phase].y_noisy % n_classes
        if cfg.method == "aum":
            scores[phase] = -aum_score(stack, y)  # low margin -> high mislabel score
        else:
            _, tuples = datamap_score(stack, y)
            scores[phase] = -tuples[:, 0]  # low mean confidence -> mislabel

    df = split_frame(cfg, splits, scores)
    if out_dir is not None:
        np.save(Path(out_dir) / "runtime.npy", np.array([runtime]))
    return evaluate_scores(df, out_dir)
