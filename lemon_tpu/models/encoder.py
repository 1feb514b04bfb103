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
import os
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
        weights_fingerprint: str = "unknown",
    ):
        """``model`` is any flax module exposing encode_image/encode_text
        (ClipModel or BiomedClipModel). ``tokenize_fn(texts) -> (B, L)
        int32`` overrides the default CLIP-BPE tokenization (e.g. WordPiece
        for BiomedCLIP)."""
        self.model = model
        self.cfg = model.cfg
        model_prec0 = getattr(model, "precision", None)
        self._static_act = bool(
            model_prec0 is not None and getattr(model_prec0, "int8_static_act", False)
        )
        if model_prec0 is not None and getattr(model_prec0, "matmul_int8", False):
            # int8 fast path: the loaders produce the standard fp32 tree;
            # quantize the projection kernels ONCE here (per-step weight
            # quantization would re-read ~350MB of weights every batch).
            # Device-resident trees (jitted random init) quantize on device
            # — the numpy path would first fetch ~600MB through a tunneled
            # TPU's relay; host trees quantize on host then upload the
            # ~1.7x smaller quantized tree.
            from lemon_tpu.models.clip import quantize_clip_params, quantize_clip_params_jit

            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            already = any("kernel_q" in str(p[-1]) for p, _ in flat)
            if not already:
                on_device = any(
                    isinstance(leaf, jax.Array) and leaf.devices() and
                    next(iter(leaf.devices())).platform != "cpu"
                    for _, leaf in flat
                )
                quantize = quantize_clip_params_jit if on_device else quantize_clip_params
                params = quantize(params, static_act=self._static_act)
        # Static-act int8 needs real activation scales; calibrate lazily on
        # the first batch the vision tower sees (clip.py
        # calibrate_act_scales). The text tower is never quantized (int8 is
        # vision-only — ClipModel.setup), so it needs no calibration.
        self._calibrated = {"img": not self._static_act, "txt": True}
        self.params = jax.device_put(params)
        self.tokenizer = tokenizer or get_tokenizer()
        self.batch_size = batch_size
        self.mesh = mesh
        self.normalize = normalize
        # Identity of the loaded weights (checkpoint path+mtime+size, or
        # "random:<seed>") — part of the embedding-cache key.
        self.weights_fingerprint = weights_fingerprint
        # Resize precision follows the model's compute precision: the fp32
        # parity path keeps the PIL-exact resize (uint8 rounding emulation,
        # fp32-HIGHEST matmuls); the bf16 fast path drops the rounding
        # emulation and runs the resize matmuls in bf16 (+4.4% embed
        # throughput; pixel error ~1e-3 of range, below the tower's own
        # bf16 activation rounding — see ops/image.py:preprocess_device).
        model_prec = getattr(model, "precision", None)
        fast_resize = (
            model_prec is not None
            and getattr(model_prec, "compute_dtype", jnp.float32) == jnp.bfloat16
        )
        self._pp_kwargs = (
            {"pil_rounding": False, "precision": "default"} if fast_resize else {}
        )
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

        def embed_pair_fn(params, images_u8, tokens):
            """Fused preprocess + both towers: ONE dispatch per batch (the
            tunneled TPU pays ~0.1-1s latency per round trip, so per-batch
            program count dominates embedding wall-clock)."""
            pixels = preprocess_device(images_u8, size=self.cfg.image_resolution, **self._pp_kwargs)
            return encode_image_fn(params, pixels), encode_text_fn(params, tokens)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            sharded = NamedSharding(mesh, P(DATA_AXIS))
            self._encode_image = jax.jit(encode_image_fn, in_shardings=(repl, sharded), out_shardings=sharded)
            self._encode_text = jax.jit(encode_text_fn, in_shardings=(repl, sharded), out_shardings=sharded)
            self._embed_pair = jax.jit(
                embed_pair_fn, in_shardings=(repl, sharded, sharded), out_shardings=(sharded, sharded)
            )
        else:
            self._encode_image = jax.jit(encode_image_fn)
            self._encode_text = jax.jit(encode_text_fn)
            self._embed_pair = jax.jit(embed_pair_fn)

    def _maybe_calibrate(self, pixels=None, tokens=None) -> None:
        """First-batch activation-scale calibration for the static-act int8
        mode: one extra (jitted) forward per tower with the act_stats
        collection mutable, then the scales are baked into ``self.params``
        for every subsequent batch. No-op in all other precision modes."""
        pixels = None if self._calibrated["img"] else pixels
        tokens = None if self._calibrated["txt"] else tokens
        if pixels is None and tokens is None:
            return
        from lemon_tpu.models.clip import calibrate_act_scales

        self.params = jax.device_put(
            calibrate_act_scales(self.model, self.params, pixels=pixels, tokens=tokens)
        )
        if pixels is not None:
            self._calibrated["img"] = True
        if tokens is not None:
            self._calibrated["txt"] = True

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
            if not self._calibrated["txt"]:
                self._maybe_calibrate(tokens=jnp.asarray(tokens))
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
            pixels = preprocess_device(batch, size=self.cfg.image_resolution, **self._pp_kwargs)
            if not self._calibrated["img"]:
                self._maybe_calibrate(pixels=pixels)
            emb = self._encode_image(self.params, pixels)
            out.append(np.asarray(emb)[:n_valid])
        return np.concatenate(out) if out else np.zeros((0, self.cfg.embed_dim), np.float32)

    # -- splits -------------------------------------------------------------

    def cache_key(self, split: Split, texts: Sequence[str]) -> str:
        """Content-addressed embedding-cache identity: everything the
        (img, txt) pair returned by :meth:`embed_split` depends on, and
        nothing else.

        Text embeddings reflect the *noisy* rendered texts
        (run_lemon.py:198-233), so the key hashes the exact text strings —
        folding in noise_type/noise_level/prompting/data_seed/subsetting —
        plus the image source and the weights fingerprint; numerics matter
        too (a bf16 fast-path run and an fp32 parity run must not share
        entries), so the model's precision config is folded in. Because the
        key is pure content (no pipeline/tag/dataset-name salt), any two
        pipelines embedding the same data with the same weights share
        entries — run_lemon grid cells across (k, seed, ablation, hparams)
        AND the baseline family against the same splits.
        """
        h = hashlib.md5()
        for t in texts:
            h.update(str(t).encode())
            h.update(b"\x00")
        if split.paths is not None:
            for p in split.paths:
                h.update(str(p).encode())
                h.update(b"\x01")
        else:
            from lemon_tpu.data.streaming import is_lazy_store

            h.update(str(split.images.shape).encode())
            fp = getattr(split.images, "fingerprint", None)
            token = fp() if fp is not None else None
            if token is not None:
                # Procedural sources (LazyRenderUint8Store and views over
                # it) carry their generator parameters as identity — a warm
                # run never renders a pixel just to compute the cache key.
                h.update(token.encode())
            elif is_lazy_store(split.images):
                # Don't materialize an out-of-RAM store: a strided 64-row
                # sample plus the shape is the fingerprint.
                sample = split.images[
                    np.linspace(0, len(split.images) - 1, min(64, len(split.images)), dtype=np.int64)
                ]
                h.update(np.ascontiguousarray(sample).tobytes())
            else:
                h.update(np.ascontiguousarray(split.images).tobytes())
        h.update(getattr(self, "weights_fingerprint", "unknown").encode())
        h.update(repr(getattr(self.model, "precision", None)).encode())
        return h.hexdigest()

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
                try:
                    blob = np.load(path)
                    return blob["img"], blob["txt"]
                except Exception as e:  # zipfile/KeyError from a torn write
                    # A file from a crashed pre-atomic-write run (or a
                    # foreign file with the same name): treat as a miss and
                    # overwrite below rather than failing the whole run.
                    print(f"embedding cache: unreadable {path} ({e}); re-embedding", flush=True)

        # One fused dispatch per batch, no per-batch blocking (async
        # dispatch overlaps host decode/tokenize of batch i+1 with device
        # compute of batch i), and ONE device-side concatenation + fetch per
        # modality at the end — per-RPC tunnel latency, not compute, is the
        # wall-clock driver on remote TPUs. Batch assembly (image gather —
        # threaded preads for stream-backed stores — + BPE tokenize) runs
        # ahead on a background thread (data/native_loader.py Prefetcher)
        # so disk IO also overlaps the dispatch loop.
        from lemon_tpu.data.native_loader import Prefetcher

        def assemble(item):
            idx, n_valid = item
            images = load_images(split, idx, decode_size=self.cfg.image_resolution)
            tokens = self._tokenize([texts[i] for i in idx])
            return images, tokens, n_valid

        img_chunks, txt_chunks, valid = [], [], []
        prefetcher = Prefetcher(iter_batches(split, self.batch_size), assemble, depth=2)
        try:
            for images, tokens, n_valid in prefetcher:
                if not (self._calibrated["img"] and self._calibrated["txt"]):
                    # jitted prep: eager ops on a tunneled TPU each pay a
                    # server-side compile round-trip
                    prep = jax.jit(
                        lambda im: preprocess_device(
                            im, size=self.cfg.image_resolution, **self._pp_kwargs
                        )
                    )
                    self._maybe_calibrate(
                        pixels=prep(jnp.asarray(images)), tokens=jnp.asarray(tokens)
                    )
                img_e, txt_e = self._embed_pair(self.params, jnp.asarray(images), jnp.asarray(tokens))
                img_chunks.append(img_e)
                txt_chunks.append(txt_e)
                valid.append(n_valid)
        finally:
            # unblock + join the worker if the embed loop raised mid-split
            # (otherwise it would sit on queue.put holding batch memory)
            prefetcher.close()
        if len(img_chunks) == 1:
            img = np.asarray(img_chunks[0])[: valid[0]]
            txt = np.asarray(txt_chunks[0])[: valid[0]]
        else:
            img_all = np.asarray(jnp.concatenate(img_chunks, axis=0))
            txt_all = np.asarray(jnp.concatenate(txt_chunks, axis=0))
            keep = np.concatenate(
                [np.arange(n) + i * self.batch_size for i, n in enumerate(valid)]
            )
            img = img_all[keep]
            txt = txt_all[keep]

        if cache_key is not None and cache_dir is not None:
            cache_dir.mkdir(parents=True, exist_ok=True)
            # Atomic publish: sweep jobs share one cache dir and may race on
            # the same key (same data+model across k/seed grid cells). Write
            # to a per-writer temp name, then os.replace — readers only ever
            # see a complete file; concurrent writers produce identical
            # bytes-equivalent content so last-rename-wins is safe.
            tmp = cache_dir / f"emb_{digest}.{os.getpid()}.tmp.npz"
            np.savez(tmp, img=img, txt=txt)
            os.replace(tmp, path)
        return img, txt
