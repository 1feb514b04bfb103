"""Shard-backed image store tests (round-1 verdict next-step 9: streaming
loader so CC3M-scale corpora compose with the sharded kNN path)."""

import numpy as np
import pytest

from lemon_tpu.data.datasets import get_dataset, load_images
from lemon_tpu.data.streaming import (
    IndexedStore,
    ShardedUint8Store,
    ShardWriter,
    is_lazy_store,
    subset_images,
)


def test_shard_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (1000, 8, 8, 3), np.uint8)
    w = ShardWriter(tmp_path / "store", shard_rows=128)
    for lo in range(0, 1000, 300):  # append sizes that straddle shard edges
        w.append(data[lo : lo + 300])
    store = w.finish()
    assert len(store) == 1000
    assert store.shape == (1000, 8, 8, 3)
    assert len(list((tmp_path / "store").glob("shard_*.npy"))) == 8  # ceil(1000/128)
    np.testing.assert_array_equal(store[np.arange(1000)], data)
    # unordered fancy indexing across shards preserves caller order
    idx = rng.permutation(1000)[:257]
    np.testing.assert_array_equal(store[idx], data[idx])
    # int and slice indexing
    np.testing.assert_array_equal(store[999], data[999])
    np.testing.assert_array_equal(store[120:140], data[120:140])
    # reopen from manifest
    store2 = ShardedUint8Store.open(tmp_path / "store")
    np.testing.assert_array_equal(store2[[0, 500, 999]], data[[0, 500, 999]])
    # ndarray duck-typing: negative indices resolve from the end; out of
    # range raises IndexError (not a bogus-shard crash)
    np.testing.assert_array_equal(store[-1], data[-1])
    np.testing.assert_array_equal(store[[-1, 0, -1000]], data[[-1, 0, -1000]])
    with pytest.raises(IndexError):
        store[[0, 1000]]
    with pytest.raises(IndexError):
        store[[-1001]]


def test_indexed_store_lazy_subset(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (500, 4, 4, 3), np.uint8)
    w = ShardWriter(tmp_path / "s", shard_rows=100)
    w.append(data)
    store = w.finish()
    idx = rng.permutation(500)[:200]
    view = subset_images(store, idx)
    assert isinstance(view, IndexedStore) and is_lazy_store(view)
    assert view.shape == (200, 4, 4, 3)
    np.testing.assert_array_equal(view[np.arange(200)], data[idx])
    # nested subset stays lazy
    view2 = subset_images(view, np.arange(0, 200, 2))
    assert is_lazy_store(view2)
    np.testing.assert_array_equal(view2[[0, 1]], data[idx[[0, 2]]])
    # ndarray passthrough copies
    assert isinstance(subset_images(data, idx), np.ndarray)


def test_stream_dataset_matches_ram(tmp_path, monkeypatch):
    """synthetic_caption_stream must be bit-identical to the RAM variant
    (same chunk-keyed RNG) while keeping images on disk."""
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(tmp_path))
    ram = get_dataset("synthetic_caption", 0, noise_level=0.4, noise_type="random", synthetic_n=300)
    stream = get_dataset("synthetic_caption_stream", 0, noise_level=0.4, noise_type="random", synthetic_n=300)
    for r, s in zip(ram, stream):
        assert is_lazy_store(s.images)
        np.testing.assert_array_equal(r.sentence, s.sentence)
        np.testing.assert_array_equal(r.gold_sentence, s.gold_sentence)
        idx = np.arange(len(r))
        np.testing.assert_array_equal(load_images(r, idx), load_images(s, idx))
    # second call reuses the on-disk cache
    stream2 = get_dataset("synthetic_caption_stream", 0, noise_level=0.4, noise_type="random", synthetic_n=300)
    np.testing.assert_array_equal(load_images(stream[0], np.arange(5)), load_images(stream2[0], np.arange(5)))


def test_e2e_detection_on_stream_backing(tmp_path, monkeypatch):
    """Full detection over a disk-backed corpus: the pipeline never needs
    the image array in RAM."""
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(tmp_path))
    from lemon_tpu.detect import DetectionConfig, run_detection

    cfg = DetectionConfig(
        dataset="synthetic_caption_stream", noise_type="random", noise_level=0.4,
        clip_model="tiny", knn_k=3, batch_size=64, synthetic_n=240, knn_tile=64,
        grid={"beta": [0, 5, 20], "gamma": [0, 5, 20], "tau_1": [0, 5], "tau_2": [0, 5]},
        embedding_cache=str(tmp_path / "embcache"),
    )
    res = run_detection(cfg)
    agg = res["agg_results"]["know_val_labels"]
    assert agg["test"]["AUROC"] > 0.7


def test_native_gather_matches_memmap_oracle(tmp_path):
    """The C++ threaded-pread engine (data/csrc/shard_gather.cc) returns
    bit-identical batches to the numpy memmap path, including unsorted and
    duplicate indices spanning shard boundaries."""
    from lemon_tpu.data.native_loader import NativeShardGather, native_gather_available

    if not native_gather_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, (777, 6, 5, 3), np.uint8)
    w = ShardWriter(tmp_path / "store", shard_rows=100)
    w.append(data)
    store = w.finish()
    eng = NativeShardGather(store)
    assert len(eng) == 777
    for idx in (
        np.arange(777),
        rng.permutation(777)[:123],
        np.array([0, 0, 776, 776, 99, 100, 101]),  # dups + shard edges
        np.array([], np.int64),
    ):
        np.testing.assert_array_equal(eng.gather(idx), data[idx])
    # the store itself routes big batches through the engine
    idx = rng.permutation(777)[:64]
    np.testing.assert_array_equal(store[idx], data[idx])
    with pytest.raises(AssertionError):
        eng.gather(np.array([777]))


def test_prefetcher_order_and_errors():
    from lemon_tpu.data.native_loader import Prefetcher

    seen = list(Prefetcher(range(10), lambda i: i * i, depth=3))
    assert seen == [i * i for i in range(10)]

    def boom(i):
        if i == 3:
            raise ValueError("boom")
        return i

    it = iter(Prefetcher(range(10), boom))
    assert [next(it) for _ in range(3)] == [0, 1, 2]
    with pytest.raises(ValueError):
        next(it)


def test_prefetcher_overlaps_gather(tmp_path):
    """Batches streamed through Prefetcher+NativeShardGather equal direct
    indexing (the wiring detect.py's embed loop uses for stream datasets)."""
    from lemon_tpu.data.native_loader import (
        NativeShardGather,
        Prefetcher,
        native_gather_available,
    )

    if not native_gather_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (512, 4, 4, 3), np.uint8)
    w = ShardWriter(tmp_path / "store", shard_rows=64)
    w.append(data)
    store = w.finish()
    eng = NativeShardGather(store)
    batches = [np.arange(i, i + 128) for i in range(0, 512, 128)]
    out = list(Prefetcher(batches, eng.gather))
    for b, got in zip(batches, out):
        np.testing.assert_array_equal(got, data[b])


def test_prefetcher_close_unblocks_worker():
    """Abandoning iteration mid-stream (e.g. the embed loop raised) must not
    leave the worker thread blocked on queue.put."""
    import itertools

    from lemon_tpu.data.native_loader import Prefetcher

    p = Prefetcher(itertools.count(), lambda i: i, depth=2)
    it = iter(p)
    assert next(it) == 0
    p.close()
    assert not p._t.is_alive()


def test_lazy_render_store_defers_until_pixel_read():
    """synthetic ram backing renders zero pixels until a batch is read; a
    warm detection run (embedding-cache hit via the fingerprint key) never
    pays the render (round-4 warm-e2e decomposition: ~10.5 s of a ~18 s
    warm run was eager synthesis)."""
    from lemon_tpu.data.streaming import LazyRenderUint8Store

    calls = {"n": 0}

    def render():
        calls["n"] += 1
        return np.arange(5 * 2 * 2 * 3, dtype=np.uint8).reshape(5, 2, 2, 3)

    s = LazyRenderUint8Store(render, 5, (2, 2, 3), token="t:v1")
    assert is_lazy_store(s)
    assert s.shape == (5, 2, 2, 3) and s.dtype == np.uint8 and len(s) == 5
    assert s.fingerprint() == "t:v1"
    assert calls["n"] == 0  # shape/len/fingerprint never render
    ref = np.arange(5 * 2 * 2 * 3, dtype=np.uint8).reshape(5, 2, 2, 3)
    np.testing.assert_array_equal(s[np.array([4, 0])], ref[[4, 0]])
    np.testing.assert_array_equal(s[1:3], ref[1:3])
    np.testing.assert_array_equal(s[2], ref[2])
    assert calls["n"] == 1  # one materialization, then plain reads

    # subset keeps laziness AND the fingerprint identity (row-aware)
    s2 = LazyRenderUint8Store(render, 5, (2, 2, 3), token="t:v1")
    view = subset_images(s2, np.array([3, 1]))
    fp_a = view.fingerprint()
    fp_b = subset_images(s2, np.array([1, 3])).fingerprint()
    assert fp_a and fp_b and fp_a != fp_b
    assert fp_a.startswith("t:v1|rows:")


def test_synthetic_caption_ram_backing_is_lazy(monkeypatch, tmp_path):
    """get_dataset('synthetic_caption') returns deferred-render splits whose
    materialized pixels bit-match the eager generator, and whose cache keys
    are computed without rendering."""
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(tmp_path))
    splits = get_dataset("synthetic_caption", 0, noise_level=0.4, noise_type="random", synthetic_n=120)
    for s in splits:
        assert is_lazy_store(s.images)
        fp = s.images.fingerprint()
        assert fp and "synthetic_captioning:v1" in fp

    from lemon_tpu.models.registry import create_encoder

    enc = create_encoder("tiny", seed=0, batch_size=32)
    train = splits[0]
    base_store = train.images._store  # IndexedStore over the render store
    texts = list(train.sentence)
    key = enc.cache_key(train, texts)
    assert base_store._data is None, "cache_key must not render pixels"
    # key is stable and text-sensitive
    assert key == enc.cache_key(train, texts)
    assert key != enc.cache_key(train, ["x"] + texts[1:])
    # materialized pixels match the eager render
    px = train.images[np.arange(len(train))]
    assert px.dtype == np.uint8 and px.shape[1:] == (32, 32, 3)
    assert base_store._data is not None
