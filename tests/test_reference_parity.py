"""End-to-end component parity: detect.build_neighbor_logs vs a literal
per-sample numpy transcription of the reference's scoring loop
(run_lemon.py:122-307), with embeddings held fixed via a deterministic mock
encoder. This isolates everything downstream of the CLIP towers — index
semantics, self-exclusion, score signs, d1 normalization, discrete text —
and must match to float tolerance."""

import dataclasses

import numpy as np
import pytest
from scipy.special import softmax

from lemon_tpu.data.datasets import get_dataset
from lemon_tpu.detect import DetectionConfig, _labels_for, _texts_for_split, build_neighbor_logs, prompt_fn
from lemon_tpu.knn.index import numpy_search


class FixedEncoder:
    """Deterministic embeddings derived from content hashes."""

    def __init__(self, dim=16):
        self.dim = dim

    def _vec(self, seed_bytes: bytes) -> np.ndarray:
        seed = int.from_bytes(seed_bytes[:8].ljust(8, b"\0"), "little") % (2**32)
        v = np.random.default_rng(seed).standard_normal(self.dim)
        return v / np.linalg.norm(v)

    def encode_texts(self, texts):
        return np.stack([self._vec(("T" + t).encode()) for t in texts]).astype(np.float32)

    def encode_images(self, images):
        return np.stack([self._vec(b"I" + im.tobytes()[:64]) for im in images]).astype(np.float32)

    def embed_split(self, split, texts, **_):
        from lemon_tpu.data.datasets import load_images

        imgs = load_images(split, np.arange(len(split)))
        return self.encode_images(imgs), self.encode_texts(list(texts))


def reference_logs(cfg, splits, encoder, label_set):
    """Independent transcription of the reference embed+score loop."""
    train = splits["train"]
    n_train = len(train)
    # comparison subsample (run_lemon.py:122-127)
    if n_train > cfg.compr_dataset_size_limit:
        compr_ids = np.random.RandomState(cfg.seed).choice(np.arange(n_train), cfg.compr_dataset_size_limit, replace=False)
    else:
        compr_ids = np.arange(n_train)
    compr = train.subset(compr_ids)
    compr_texts, _, _, _ = _texts_for_split(cfg, compr, label_set)
    img_tr, txt_tr = encoder.embed_split(compr, compr_texts)
    metric = "ip" if cfg.dist_type == "cosine" else "l2"
    if cfg.dist_type == "cosine":
        dists_tr = 1 - np.sum(txt_tr * img_tr, axis=1)
    else:
        dists_tr = np.sum((txt_tr - img_tr) ** 2, axis=1)
    compr_text_arr = np.asarray(compr_texts)

    label_embs = None
    if cfg.normalize_d1:
        p = prompt_fn(cfg)
        label_embs = encoder.encode_texts([p(l) for l in label_set])

    in_compr = np.zeros(n_train, bool)
    in_compr[compr_ids] = True
    rows = []
    for sname in ("train", "val", "test"):
        split = splits[sname]
        noisy_texts, _, noisy_labels, _ = _texts_for_split(cfg, split, label_set)
        img, txt = (img_tr, txt_tr) if (sname == "train" and n_train <= cfg.compr_dataset_size_limit) else encoder.embed_split(split, noisy_texts)
        k = cfg.knn_k
        D_ns, I_ns = numpy_search(img_tr, img, k + (sname == "train"), metric)
        D_ms, I_ms = numpy_search(txt_tr, txt, k + (sname == "train"), metric)
        for i in range(len(split)):
            D_n, I_n = D_ns[i], I_ns[i]
            D_m, I_m = D_ms[i], I_ms[i]
            if sname == "train":  # self-exclusion (run_lemon.py:257-263)
                if in_compr[i]:
                    D_n, I_n, D_m, I_m = D_n[1:], I_n[1:], D_m[1:], I_m[1:]
                else:
                    D_n, I_n, D_m, I_m = D_n[:-1], I_n[:-1], D_m[:-1], I_m[:-1]
            if cfg.normalize_d1:
                if cfg.dist_type == "cosine":
                    d1 = softmax(1 - label_embs @ img[i])[int(noisy_labels[i]) % len(label_set)]
                else:
                    d1 = softmax(((img[i] - label_embs) ** 2).sum(1))[int(noisy_labels[i]) % len(label_set)]
            elif cfg.dist_type == "cosine":
                d1 = 1 - float(img[i] @ txt[i])
            else:
                d1 = float(((img[i] - txt[i]) ** 2).sum())
            if cfg.use_discrete_for_text:
                dists_n = 1.0 - (compr_text_arr[I_n] == noisy_texts[i]).astype(float)
            elif cfg.dist_type == "cosine":
                dists_n = 1 - txt_tr[I_n] @ txt[i]
            else:
                dists_n = ((txt[i] - txt_tr[I_n]) ** 2).sum(1)
            if cfg.dist_type == "cosine":
                dists_m = 1 - img_tr[I_m] @ img[i]
                # the reference's ``D_n = -D_n`` lives INSIDE the
                # non-discrete else-branch (run_lemon.py:266-273): under
                # --use_discrete_for_text D_n keeps the raw similarity
                # sign while D_m is still negated (verified against the
                # live reference, caption_discrete golden)
                D_n_signed = D_n if cfg.use_discrete_for_text else -D_n
                D_m_signed = -D_m
            else:
                dists_m = ((img[i] - img_tr[I_m]) ** 2).sum(1)
                D_n_signed, D_m_signed = D_n, D_m
            rows.append(dict(
                sset=sname, d_1=d1, dists_n=dists_n, D_n=D_n_signed, dists_tr_n=dists_tr[I_n],
                dists_m=dists_m, D_m=D_m_signed, dists_tr_m=dists_tr[I_m],
            ))
    return rows


@pytest.mark.parametrize("variant", ["cosine", "euclidean", "cosine_subsampled", "normalize_d1", "discrete_text"])
def test_components_match_reference_transcription(variant):
    kw = dict(dataset="synthetic_caption", noise_type="random", noise_level=0.4, clip_model="tiny", knn_k=3, batch_size=32, synthetic_n=120, knn_tile=32)
    if variant == "euclidean":
        kw["dist_type"] = "euclidean"
    if variant == "cosine_subsampled":
        kw["compr_dataset_size_limit"] = 50  # train=96 -> subsampled
    if variant in ("normalize_d1", "discrete_text"):
        kw.update(dataset="synthetic", noise_type="symmetric")
        if variant == "normalize_d1":
            kw["normalize_d1"] = True
        else:
            kw["use_discrete_for_text"] = True
    cfg = DetectionConfig(**kw)

    splits = dict(zip(("train", "val", "test"), get_dataset(cfg.dataset, cfg.data_seed, noise_level=cfg.noise_level, noise_type=cfg.noise_type, synthetic_n=cfg.synthetic_n)))
    label_set = _labels_for(cfg)
    np.random.seed(cfg.seed)  # reference uses the global stream for the subsample
    logs, _ = build_neighbor_logs(cfg, FixedEncoder(), splits, label_set)
    np.random.seed(cfg.seed)
    expected = reference_logs(cfg, splits, FixedEncoder(), label_set)

    assert len(logs) == len(expected)
    for i, exp in enumerate(expected):
        assert logs.sset[i] == exp["sset"]
        np.testing.assert_allclose(logs.d_1[i], exp["d_1"], rtol=2e-5, atol=2e-6, err_msg=f"{variant} d1 row {i}")
        for field in ("dists_n", "D_n", "dists_tr_n", "dists_m", "D_m", "dists_tr_m"):
            np.testing.assert_allclose(
                getattr(logs, field)[i], exp[field], rtol=2e-4, atol=2e-5,
                err_msg=f"{variant} {field} row {i}",
            )
