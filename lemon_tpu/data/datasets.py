"""Dataset registry and array-backed splits.

TPU-first redesign of the reference's torch ``Dataset`` stack
(lib/datasets/dataloader.py, lib/datasets/utils.py:350-430):

- Splits are **struct-of-arrays** (uint8 image tensors or path lists +
  label/caption arrays), not per-item ``__getitem__`` objects. Batches come
  out as fixed-shape arrays (last batch padded, valid-count tracked) so
  every downstream jit sees static shapes.
- Raw uint8 images travel to the device; resize/crop/normalize runs there
  (lemon_tpu.ops.image), replacing torchvision-on-8-CPU-workers.
- Dataset roots resolve via ``LEMON_TPU_DATA_ROOT`` (default ``./data``)
  instead of hard-coded cluster paths (lib/datasets/utils.py:16-25).

Supported names mirror run_lemon.py:37-38: cifar10, cifar100, cifar10_full,
cifar100_full (auto-loaded from the standard CIFAR python pickles),
mscoco / flickr30k / mimiccxr_caption / mmimdb / cc3m (via each dataset's
``multimodal_mislabel_split.pkl`` metadata), mini_imagenet / stanford_cars
(``multimodal_mislabel_split.csv``), plus 'synthetic*' generators for tests
and benchmarks.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import tarfile
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from lemon_tpu.data.labels import num_classes
from lemon_tpu.data.noise import (
    apply_caption_noise,
    caption_noise_by_matching,
    caption_noise_random,
    flip_labels,
)
from lemon_tpu.data.splits import split_80_10_10, split_80_20, stratified_50_25_25

CLF_DATASETS = ("cifar10", "cifar100", "cifar10_full", "cifar100_full", "mini_imagenet", "stanford_cars")
CAPTION_DATASETS = ("mscoco", "flickr30k", "mimiccxr_caption", "mmimdb", "cc3m")


def data_root() -> Path:
    return Path(os.environ.get("LEMON_TPU_DATA_ROOT", "./data"))


def dataset_path(name: str) -> Path:
    override = os.environ.get(f"LEMON_TPU_PATH_{name.upper()}")
    return Path(override) if override else data_root() / name


# ---------------------------------------------------------------------------
# split containers


@dataclasses.dataclass
class ClassificationSplit:
    """(images, y_clean, y_noisy) — the reference's NoisyCombinedDataset
    triple (lib/datasets/dataloader.py:16-30) as dense arrays."""

    y_clean: np.ndarray
    y_noisy: np.ndarray
    images: Optional[np.ndarray] = None  # (N, H, W, 3) uint8
    paths: Optional[List[str]] = None

    def __post_init__(self):
        assert (self.images is None) != (self.paths is None)

    def __len__(self) -> int:
        return len(self.y_noisy)

    @property
    def is_mislabel(self) -> np.ndarray:
        return (self.y_clean != self.y_noisy).astype(np.int64)

    def subset(self, idx: np.ndarray) -> "ClassificationSplit":
        from lemon_tpu.data.streaming import subset_images

        return ClassificationSplit(
            y_clean=self.y_clean[idx],
            y_noisy=self.y_noisy[idx],
            images=subset_images(self.images, idx),
            paths=None if self.paths is None else [self.paths[i] for i in idx],
        )


@dataclasses.dataclass
class CaptioningSplit:
    """(image, gold_sentence, noisy_sentence) rows
    (lib/datasets/dataloader.py:167-198)."""

    sentence: np.ndarray  # noisy captions (object array of str)
    gold_sentence: np.ndarray
    images: Optional[np.ndarray] = None
    paths: Optional[List[str]] = None
    sent_cluster: Optional[np.ndarray] = None  # deep-kNN pseudo-labels

    def __len__(self) -> int:
        return len(self.sentence)

    @property
    def is_mislabel(self) -> np.ndarray:
        return (self.sentence != self.gold_sentence).astype(np.int64)

    def subset(self, idx: np.ndarray) -> "CaptioningSplit":
        from lemon_tpu.data.streaming import subset_images

        return CaptioningSplit(
            sentence=self.sentence[idx],
            gold_sentence=self.gold_sentence[idx],
            images=subset_images(self.images, idx),
            paths=None if self.paths is None else [self.paths[i] for i in idx],
            sent_cluster=None if self.sent_cluster is None else self.sent_cluster[idx],
        )


Split = ClassificationSplit | CaptioningSplit


def iter_batches(split: Split, batch_size: int, pad: bool = True) -> Iterator[Tuple[np.ndarray, int]]:
    """Yield (index_array, n_valid) per batch; the final batch is padded by
    repeating its last index so downstream shapes stay static."""
    n = len(split)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        n_valid = len(idx)
        if pad and n_valid < batch_size:
            idx = np.concatenate([idx, np.full(batch_size - n_valid, idx[-1])])
        yield idx, n_valid


def load_images(split: Split, idx: np.ndarray, decode_size: Optional[int] = None, stack: bool = True):
    """Materialize a batch of uint8 HWC images (decode from disk in paths
    mode — the only remaining host-side work).

    Real paths-backed corpora (mscoco/flickr30k/...) have heterogeneous
    raw sizes, which cannot stack into one device batch. With
    ``decode_size`` set (model-aware callers pass their input resolution),
    a ragged batch is host-resized per image with the reference's exact
    transform — PIL bicubic shorter-side Resize + CenterCrop
    (lib/datasets/utils.py:163-170) — to ``decode_size`` and returned as
    uint8; the device preprocess then degenerates to an identity resize +
    normalize, so the end-to-end pixel math equals the reference's.
    Uniform batches stack raw regardless (the on-device resize path,
    byte-parity-tested vs PIL, stays the fast path).

    ``stack=False`` returns a LIST of raw per-image arrays (original
    sizes, no unification) — for consumers whose downstream processor
    resizes each image itself (HF VLM/ITM processors, like the reference
    feeding PIL images)."""
    if split.images is not None:
        batch = split.images[idx]
        return list(batch) if not stack else batch
    from PIL import Image

    out = []
    for i in idx:
        with Image.open(split.paths[i]) as img:
            out.append(np.asarray(img.convert("RGB"), np.uint8))
    if not stack:
        return out
    shapes = {a.shape for a in out}
    if len(shapes) > 1:
        if decode_size is None:
            raise ValueError(
                f"batch mixes image shapes {sorted(shapes)}; pass "
                "decode_size=<model input resolution> so load_images can "
                "apply the reference's PIL Resize+CenterCrop per image"
            )
        from lemon_tpu.ops.image import pil_resize_crop_u8

        out = [pil_resize_crop_u8(a, decode_size) for a in out]
    return np.stack(out)


# ---------------------------------------------------------------------------
# CIFAR (standard python-pickle layout, as produced by the usual downloads)


def _load_cifar_pickles(name: str, train: bool) -> Tuple[np.ndarray, np.ndarray]:
    root = data_root()
    if name.startswith("cifar10_") or name == "cifar10":
        base = root / "cifar-10-batches-py"
        files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        label_key = b"labels"
    else:
        base = root / "cifar-100-python"
        files = ["train"] if train else ["test"]
        label_key = b"fine_labels"
    if not base.exists():
        # Also accept the .tar.gz next to the directory.
        tgz = base.with_suffix(".tar.gz")
        alt = {"cifar-10-batches-py": "cifar-10-python.tar.gz", "cifar-100-python": "cifar-100-python.tar.gz"}[base.name]
        tgz = tgz if tgz.exists() else root / alt
        if tgz.exists():
            with tarfile.open(tgz) as tf:
                tf.extractall(root)
    if not base.exists():
        raise FileNotFoundError(
            f"CIFAR data not found under {base}; place the standard python "
            "pickle archive there or use dataset='synthetic'."
        )
    xs, ys = [], []
    for fname in files:
        with open(base / fname, "rb") as f:
            blob = pickle.load(f, encoding="bytes")
        xs.append(np.asarray(blob[b"data"], np.uint8))
        ys.append(np.asarray(blob[label_key], np.int64))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # -> NHWC
    return np.ascontiguousarray(x), np.concatenate(ys)


def load_cifar10c(corruption_name: str, severity: int | None = None) -> ClassificationSplit:
    """CIFAR-10-C corrupted test set (Hendrycks & Dietterich release):
    ``CIFAR-10-C/{corruption}.npy`` stacks 10k test images at severities
    1-5 (50k rows, NHWC uint8) with a shared ``labels.npy``.

    The reference's downstream robustness path intends this loader —
    train_downstream_classification.py:136-138 passes
    ``cifar10_corruption_name`` to get_dataset, where the kwarg does not
    exist (SURVEY §7 item 7: reconstruct the obviously-missing piece).
    Labels are clean (y_clean == y_noisy): this is an eval-only split."""
    for base in (data_root() / "CIFAR-10-C", data_root() / "cifar10c"):
        if base.exists():
            break
    else:
        raise FileNotFoundError(
            f"CIFAR-10-C not found under {data_root()}; extract the "
            "https://zenodo.org/record/2535967 archive there."
        )
    images = np.load(base / f"{corruption_name}.npy")
    labels = np.load(base / "labels.npy").astype(np.int64)
    assert images.ndim == 4 and len(images) == len(labels), images.shape
    if severity is not None:
        assert 1 <= severity <= 5, severity
        per = len(images) // 5
        sl = slice((severity - 1) * per, severity * per)
        images, labels = images[sl], labels[sl]
    return ClassificationSplit(y_clean=labels, y_noisy=labels.copy(), images=np.ascontiguousarray(images))


def _classification_triplet(images, y, noisy, tr, va, te):
    mk = lambda idx: ClassificationSplit(y_clean=y[idx], y_noisy=noisy[idx], images=images[idx])
    return mk(tr), mk(va), mk(te)


# ---------------------------------------------------------------------------
# synthetic data (tests / benchmarks; no-network environments)


def synthetic_classification(
    n: int = 600,
    n_classes: int = 10,
    image_size: int = 32,
    data_seed: int = 0,
    noise_level: float = 0.4,
    noise_type: str = "symmetric",
):
    """Class-conditional structured images + transition-matrix noise.

    Each class has a distinctive low-frequency template, so even a frozen
    random encoder separates classes enough for end-to-end sanity checks.
    """
    rng = np.random.default_rng(data_seed)
    y = rng.integers(0, n_classes, n)
    yy, xx = np.mgrid[0:image_size, 0:image_size]
    templates = np.stack(
        [
            np.stack(
                [
                    127 + 120 * np.sin(2 * np.pi * ((c + 1) * xx / image_size + (ch + 1) * yy / image_size) / 2)
                    for ch in range(3)
                ],
                axis=-1,
            )
            for c in range(n_classes)
        ]
    )
    images = templates[y] + rng.normal(0, 12, (n, image_size, image_size, 3))
    images = np.clip(images, 0, 255).astype(np.uint8)
    noisy = flip_labels("synthetic", noise_type, noise_level, y, data_seed, n_classes=n_classes)
    tr, va, te = split_80_10_10(n, data_seed)
    return _classification_triplet(images, y, noisy, tr, va, te)


def synthetic_captioning(
    n: int = 400,
    image_size: int = 32,
    data_seed: int = 0,
    noise_level: float = 0.4,
    flip_type: str = "random",
    backing: str = "ram",
):
    """Synthetic image-caption pairs with caption-swap noise.

    ``backing='memmap'`` streams the images through on-disk .npy shards
    (generated in chunks, cached under <data_root>/synthetic_stream) so
    corpora far beyond RAM compose with the sharded kNN path; splits hold
    lazy row views and host RSS stays bounded (round-1 verdict next-step 9).
    """
    import pandas as pd

    rng = np.random.default_rng(data_seed)
    n_concepts = 12
    concept = rng.integers(0, n_concepts, n)
    adjectives = ["small", "large", "red", "blue", "striped", "old"]
    nouns = ["bird", "car", "house", "tree", "dog", "boat", "chair", "flower", "train", "cat", "plane", "horse"]
    sentences = np.array(
        [f"a {adjectives[rng.integers(0, len(adjectives))]} {nouns[c]} in a scene" for c in concept], object
    )
    yy, xx = np.mgrid[0:image_size, 0:image_size]
    templates = np.stack(
        [
            np.stack([127 + 120 * np.cos(2 * np.pi * ((c + 2) * xx + (ch + 1) * yy) / image_size / 3) for ch in range(3)], -1)
            for c in range(n_concepts)
        ]
    )

    def gen_chunk(lo: int, hi: int) -> np.ndarray:
        # per-chunk RNG keyed on the chunk start: identical images for any
        # chunking, so ram/memmap backings agree bit-for-bit
        crng = np.random.default_rng((data_seed, lo))
        noise = crng.normal(0, 10, (hi - lo, image_size, image_size, 3))
        return np.clip(templates[concept[lo:hi]] + noise, 0, 255).astype(np.uint8)

    chunk = 8192
    if backing == "memmap":
        from lemon_tpu.data.streaming import ShardedUint8Store, ShardWriter

        cache = data_root() / "synthetic_stream" / f"cap_n{n}_s{image_size}_seed{data_seed}"
        if (cache / "manifest.json").exists():
            images = ShardedUint8Store.open(cache)
        else:
            writer = ShardWriter(cache, shard_rows=chunk)
            for lo in range(0, n, chunk):
                writer.append(gen_chunk(lo, min(lo + chunk, n)))
            images = writer.finish()
        assert len(images) == n
    else:
        # Deferred render: the images are a pure function of
        # (data_seed, n, image_size), so hand the generator (not pixels) to
        # the pipeline. A warm detection run (embedding-cache hit) reads
        # zero pixels and skips the ~0.5 ms/img render entirely; a cold run
        # materializes once at first batch read. The fingerprint is the
        # embedding-cache identity (ClipEncoder.cache_key).
        from lemon_tpu.data.streaming import LazyRenderUint8Store

        images = LazyRenderUint8Store(
            lambda: np.concatenate([gen_chunk(lo, min(lo + chunk, n)) for lo in range(0, n, chunk)]),
            n,
            (image_size, image_size, 3),
            token=f"synthetic_captioning:v1:n={n}:size={image_size}:seed={data_seed}",
        )

    from lemon_tpu.data.streaming import subset_images

    df = pd.DataFrame({"sentence": sentences, "cat_labels": [[int(c)] for c in concept], "nouns_int": [[int(c)] for c in concept]})
    tr, va, te = split_80_10_10(n, data_seed)
    out = []
    for idx in (tr, va, te):
        sub = df.iloc[idx].reset_index(drop=True)
        if flip_type == "random":
            swaps = caption_noise_random(len(sub), noise_level, data_seed)
        else:
            col = "nouns_int" if flip_type == "noun" else "cat_labels"
            swaps = caption_noise_by_matching(sub[col].values, noise_level, data_seed)
        noised = apply_caption_noise(sub, swaps)
        out.append(
            CaptioningSplit(
                sentence=noised["sentence"].to_numpy(),
                gold_sentence=noised["gold_sentence"].to_numpy(),
                images=subset_images(images, idx),
            )
        )
    return tuple(out)


# ---------------------------------------------------------------------------
# captioning metadata datasets


def load_captioning_dataset(name: str, data_seed: int, percent_flips: float, flip_type: str, cluster: bool = False, cluster_kwargs: Dict | None = None):
    """Metadata-driven captioning datasets (get_captioning_dataset,
    lib/datasets/utils.py:275-323): one caption per image, offline-computed
    noun/category integer tags, caption-swap noise per split."""
    import pandas as pd

    assert 0 <= percent_flips <= 1
    root = dataset_path(name)
    df = pd.read_pickle(root / "multimodal_mislabel_split.pkl")
    if "restval" in set(df["split"]):
        df.loc[df.split == "restval", "split"] = "train"

    if name == "mscoco":
        df["path"] = [str(root / fp / fn) for fp, fn in zip(df["filepath"], df["filename"])]
    elif name == "flickr30k":
        df["path"] = [str(root / "flickr30k_images" / fn) for fn in df["filename"]]
    elif name == "mimiccxr_caption":
        df["path"] = [
            str(root / "files" / f"p{str(s)[:2]}" / f"p{s}" / f"s{st}" / f"{d}.jpg")
            for s, st, d in zip(df["subject_id"], df["study_id"], df["dicom_id"])
        ]
        df = df[df.sentence.str.len() > 0]
    elif name in ("mmimdb", "cc3m"):
        if "path" not in df:
            df["path"] = [str(root / fn) for fn in df["filename"]]

    splits = {}
    for split in ("train", "val", "test"):
        sub = df.query(f'split == "{split}"')
        if flip_type == "random":
            swaps = caption_noise_random(len(sub), percent_flips, data_seed)
        elif flip_type == "noun":
            swaps = caption_noise_by_matching(sub["nouns_int"].values, percent_flips, data_seed)
        elif flip_type == "cat":
            swaps = caption_noise_by_matching(sub["cat_labels"].values, percent_flips, data_seed)
        else:
            raise NotImplementedError(flip_type)
        splits[split] = apply_caption_noise(sub, swaps)

    clusters = {s: None for s in splits}
    if cluster:
        from lemon_tpu.data.clustering import cluster_caption_text

        kw = dict(cluster_kwargs or {})
        km, train_clusters = cluster_caption_text(list(splits["train"]["sentence"].values), **kw)
        clusters["train"] = train_clusters
        clusters["val"] = km.predict(list(splits["val"]["sentence"].values))
        clusters["test"] = km.predict(list(splits["test"]["sentence"].values))

    return tuple(
        CaptioningSplit(
            sentence=splits[s]["sentence"].to_numpy(),
            gold_sentence=splits[s]["gold_sentence"].to_numpy(),
            paths=list(splits[s]["path"].values),
            sent_cluster=clusters[s],
        )
        for s in ("train", "val", "test")
    )


def load_large_scale_dataset(name: str, seed: int):
    """mini_imagenet / stanford_cars with real web noise
    (lib/datasets/utils.py:325-347, dataloader.py:113-133): the clean label
    is unknown for noisy rows, encoded as noisy_label - 1."""
    import pandas as pd

    root = dataset_path(name)
    df = pd.read_csv(root / "multimodal_mislabel_split.csv")
    if "path" not in df:
        df["path"] = [str(root / fn) for fn in df["filename"]]
    tr, va, te = stratified_50_25_25(df["is_clean"].to_numpy(), seed)
    out = []
    for idx in (tr, va, te):
        sub = df.iloc[np.sort(idx)]
        noisy = sub["label"].to_numpy(np.int64)
        clean = np.where(sub["is_clean"].to_numpy(bool), noisy, noisy - 1)
        out.append(ClassificationSplit(y_clean=clean, y_noisy=noisy, paths=list(sub["path"].values)))
    return tuple(out)


# ---------------------------------------------------------------------------
# registry


def get_dataset(
    name: str,
    data_seed: int,
    noise_level: float = 0.4,
    noise_type: str = "real",
    cluster_text: bool = False,
    cluster_kwargs: Dict | None = None,
    synthetic_n: int = 600,
    corruption_name: str | None = None,
):
    """(train, val, test) splits; dispatcher mirroring get_dataset
    (lib/datasets/utils.py:350-430)."""
    if name.startswith("synthetic_caption"):
        return synthetic_captioning(
            synthetic_n, data_seed=data_seed, noise_level=noise_level,
            flip_type=noise_type if noise_type in ("random", "noun", "cat") else "random",
            backing="memmap" if name.endswith("_stream") else "ram",
        )
    if name.startswith("synthetic"):
        return synthetic_classification(
            synthetic_n, data_seed=data_seed, noise_level=noise_level,
            noise_type=noise_type if noise_type in ("symmetric", "asymmetric") else "symmetric",
        )

    if name == "cifar10c":
        # Robustness eval: cifar10 train/val (with the requested noise) +
        # the corrupted test set (train_downstream_classification.py intent;
        # the reference's own get_dataset lacks this branch — defect).
        assert corruption_name, "cifar10c needs corruption_name"
        images, y = _load_cifar_pickles("cifar10", train=True)
        noisy = flip_labels("cifar10", noise_type, noise_level, y, data_seed)
        tr, va, _ = split_80_10_10(len(y), data_seed)
        train, val, _ = _classification_triplet(images, y, np.asarray(noisy), tr, va, tr[:0])
        return train, val, load_cifar10c(corruption_name)

    if name in ("cifar10", "cifar100"):
        images, y = _load_cifar_pickles(name, train=True)
        noisy = flip_labels(name, noise_type, noise_level, y, data_seed)
        tr, va, te = split_80_10_10(len(y), data_seed)
        return _classification_triplet(images, y, np.asarray(noisy), tr, va, te)

    if name in ("cifar10_full", "cifar100_full"):
        img_tr, y_tr = _load_cifar_pickles(name, train=True)
        img_te, y_te = _load_cifar_pickles(name, train=False)
        noisy_tr = np.asarray(flip_labels(name, noise_type, noise_level, y_tr, data_seed))
        noisy_te = np.asarray(flip_labels(name, noise_type, noise_level, y_te, data_seed))
        tr, va = split_80_20(len(y_tr), data_seed)
        return (
            ClassificationSplit(y_clean=y_tr[tr], y_noisy=noisy_tr[tr], images=img_tr[tr]),
            ClassificationSplit(y_clean=y_tr[va], y_noisy=noisy_tr[va], images=img_tr[va]),
            ClassificationSplit(y_clean=y_te, y_noisy=noisy_te, images=img_te),
        )

    if name in CAPTION_DATASETS:
        return load_captioning_dataset(name, data_seed, noise_level, noise_type, cluster_text, cluster_kwargs)

    if name in ("mini_imagenet", "stanford_cars"):
        assert noise_type == "real"
        return load_large_scale_dataset(name, data_seed)

    raise NotImplementedError(name)
