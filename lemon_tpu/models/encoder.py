"""Batched CLIP embedding engine.

Replaces the reference's per-batch torch loop (run_lemon.py:136-164):
tokenize on host, then one jitted device program per batch that fuses
preprocessing, the tower forward, and L2 normalization; batches stream with
static shapes (last batch padded). With a mesh, batches shard over the data
axis — each chip embeds its slice (pure DP; SURVEY.md §2c).

Embeddings can be cached to disk keyed on (dataset fingerprint, model,
preprocessing), a capability upgrade over the reference which re-embeds on
every run (SURVEY.md §5 checkpoint/resume notes).
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lemon_tpu.core.mesh import DATA_AXIS
from lemon_tpu.data.datasets import Split, iter_batches, load_images
from lemon_tpu.models.tokenizer import ClipBpeTokenizer, get_tokenizer, tokenize_batch
from lemon_tpu.ops.image import preprocess_device


class ClipEncoder:
    """Frozen CLIP wrapper: numpy in, L2-normalized numpy embeddings out."""

    def __init__(
        self,
        model,
        params,
        tokenizer: Optional[ClipBpeTokenizer] = None,
        batch_size: int = 128,
        mesh=None,
        normalize: bool = True,
        tokenize_fn=None,
    ):
        """``model`` is any flax module exposing encode_image/encode_text
        (ClipModel or BiomedClipModel). ``tokenize_fn(texts) -> (B, L)
        int32`` overrides the default CLIP-BPE tokenization (e.g. WordPiece
        for BiomedCLIP)."""
        self.model = model
        self.cfg = model.cfg
        self.params = jax.device_put(params)
        self.tokenizer = tokenizer or get_tokenizer()
        self.batch_size = batch_size
        self.mesh = mesh
        self.normalize = normalize
        self._tokenize = tokenize_fn or (
            lambda texts: tokenize_batch(list(texts), self.cfg.context_length, self.tokenizer)
        )

        def encode_image_fn(params, pixels):
            emb = self.model.apply(params, pixels, method="encode_image")
            if normalize:
                emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return emb

        def encode_text_fn(params, tokens):
            emb = self.model.apply(params, tokens, method="encode_text")
            if normalize:
                emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return emb

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            kw = dict(
                in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(DATA_AXIS))),
                out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
            )
            self._encode_image = jax.jit(encode_image_fn, **kw)
            self._encode_text = jax.jit(encode_text_fn, **kw)
        else:
            self._encode_image = jax.jit(encode_image_fn)
            self._encode_text = jax.jit(encode_text_fn)

    # -- text ---------------------------------------------------------------

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        out = []
        bs = self.batch_size
        for start in range(0, len(texts), bs):
            chunk = list(texts[start : start + bs])
            n_valid = len(chunk)
            if n_valid < bs and len(texts) > bs:
                chunk = chunk + [chunk[-1]] * (bs - n_valid)  # static shapes
            tokens = self._tokenize(chunk)
            emb = self._encode_text(self.params, jnp.asarray(tokens))
            out.append(np.asarray(emb)[:n_valid])
        return np.concatenate(out) if out else np.zeros((0, self.cfg.embed_dim), np.float32)

    # -- images -------------------------------------------------------------

    def encode_images(self, images_u8: np.ndarray) -> np.ndarray:
        out = []
        bs = self.batch_size
        n = len(images_u8)
        for start in range(0, n, bs):
            batch = images_u8[start : start + bs]
            n_valid = len(batch)
            if n_valid < bs and n > bs:
                batch = np.concatenate([batch, np.repeat(batch[-1:], bs - n_valid, 0)])
            pixels = preprocess_device(batch, size=self.cfg.image_resolution)
            emb = self._encode_image(self.params, pixels)
            out.append(np.asarray(emb)[:n_valid])
        return np.concatenate(out) if out else np.zeros((0, self.cfg.embed_dim), np.float32)

    # -- splits -------------------------------------------------------------

    def embed_split(
        self,
        split: Split,
        texts: Sequence[str],
        cache_key: Optional[str] = None,
        cache_dir: Optional[Path] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(image_embeddings, text_embeddings) for a split + its rendered
        text labels; optionally disk-cached."""
        if cache_key is not None and cache_dir is not None:
            cache_dir = Path(cache_dir)
            digest = hashlib.md5(cache_key.encode()).hexdigest()
            path = cache_dir / f"emb_{digest}.npz"
            if path.exists():
                blob = np.load(path)
                return blob["img"], blob["txt"]

        # Dispatch every batch without blocking: jax's async dispatch
        # overlaps the host-side decode/tokenize of batch i+1 with the
        # device compute of batch i; results are fetched once at the end.
        img_chunks, txt_chunks, valid = [], [], []
        for idx, n_valid in iter_batches(split, self.batch_size):
            images = load_images(split, idx)
            pixels = preprocess_device(images, size=self.cfg.image_resolution)
            tokens = self._tokenize([texts[i] for i in idx])
            img_chunks.append(self._encode_image(self.params, pixels))
            txt_chunks.append(self._encode_text(self.params, jnp.asarray(tokens)))
            valid.append(n_valid)
        img = np.concatenate([np.asarray(e)[:n] for e, n in zip(img_chunks, valid)])
        txt = np.concatenate([np.asarray(e)[:n] for e, n in zip(txt_chunks, valid)])

        if cache_key is not None and cache_dir is not None:
            cache_dir.mkdir(parents=True, exist_ok=True)
            np.savez(path, img=img, txt=txt)
        return img, txt
