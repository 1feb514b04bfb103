"""Contrastive trainer tests: loss semantics, DP-mesh global-batch
equivalence (SURVEY.md §7 hard part #6), checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemon_tpu.core.mesh import get_mesh
from lemon_tpu.models.clip import ClipConfig
from lemon_tpu.train.contrastive import (
    TrainConfig,
    clip_loss,
    create_train_state,
    make_train_step,
    shard_train_batch,
)


def make_batch(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    pixels = rng.standard_normal((b, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size - 2, (b, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1
    return pixels, tokens


def test_clip_loss_prefers_diagonal():
    eye = jnp.eye(4) * 10.0
    anti = (1 - jnp.eye(4)) * 10.0
    assert float(clip_loss(eye, eye.T)) < float(clip_loss(anti, anti.T))
    # uniform logits -> log(n)
    uni = jnp.zeros((4, 4))
    assert float(clip_loss(uni, uni)) == pytest.approx(np.log(4), abs=1e-5)


def test_single_device_step_decreases_loss():
    cfg = ClipConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10, batch_size=8)
    model, state = create_train_state(cfg, tcfg)
    step = make_train_step(model)
    pixels, tokens = make_batch(cfg, 8)
    losses = []
    for _ in range(5):
        state, loss = step(state, jnp.asarray(pixels), jnp.asarray(tokens))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_fused_optimizer_matches_per_leaf_trajectory():
    """TrainConfig.fused_optimizer (optax.flatten) must be a pure layout
    change: identical loss trajectory to the per-leaf optimizer."""
    cfg = ClipConfig.tiny()
    pixels, tokens = make_batch(cfg, 8)
    trajectories = {}
    for fused in (False, True):
        tcfg = TrainConfig(
            learning_rate=1e-3, warmup_steps=1, total_steps=10, fused_optimizer=fused
        )
        model, state = create_train_state(cfg, tcfg)
        step = make_train_step(model)
        tr = []
        for _ in range(4):
            state, loss = step(state, jnp.asarray(pixels), jnp.asarray(tokens))
            tr.append(float(loss))
        trajectories[fused] = tr
    np.testing.assert_allclose(trajectories[False], trajectories[True], rtol=0, atol=1e-6)


def test_bf16_precision_training_decreases_loss():
    """TrainConfig(precision='bf16') — the TPU fast path (bf16 compute,
    fp32 params/LN) — trains: finite, decreasing loss, fp32 params."""
    cfg = ClipConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10, batch_size=8,
                       precision="bf16")
    model, state = create_train_state(cfg, tcfg)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # params stay fp32
    step = make_train_step(model)
    pixels, tokens = make_batch(cfg, 8)
    losses = []
    for _ in range(5):
        state, loss = step(state, jnp.asarray(pixels), jnp.asarray(tokens))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_mesh_step_matches_single_device():
    """Global-batch InfoNCE under DP must equal the single-device loss —
    GSPMD inserts the all-gather; semantics must not change."""
    cfg = ClipConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10, batch_size=8)
    pixels, tokens = make_batch(cfg, 8, seed=3)

    model, state_1 = create_train_state(cfg, tcfg)
    step_1 = make_train_step(model)
    state_1, loss_1 = step_1(state_1, jnp.asarray(pixels), jnp.asarray(tokens))

    mesh = get_mesh()
    model, state_n = create_train_state(cfg, tcfg, mesh=mesh)
    step_n = make_train_step(model, mesh=mesh)
    p_sh, t_sh = shard_train_batch(mesh, pixels, tokens)
    state_n, loss_n = step_n(state_n, p_sh, t_sh)

    assert float(loss_n) == pytest.approx(float(loss_1), abs=1e-4)
    # parameters after one step also agree
    a = jax.tree_util.tree_leaves(state_1.params)
    b = jax.tree_util.tree_leaves(state_n.params)
    worst = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(a, b))
    assert worst < 1e-4, worst


def test_tp_mesh_step_matches_single_device():
    """dp×tp (4, 2) mesh: the transformer projections shard
    Megatron-style over the model axis (train_state_shardings) and GSPMD
    inserts the all-reduces — one step must reproduce the single-device
    loss and parameter update."""
    from lemon_tpu.core.mesh import MODEL_AXIS
    from lemon_tpu.train.contrastive import train_state_shardings

    cfg = ClipConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10, batch_size=8)
    pixels, tokens = make_batch(cfg, 8, seed=5)

    model, state_1 = create_train_state(cfg, tcfg)
    step_1 = make_train_step(model)
    state_1, loss_1 = step_1(state_1, jnp.asarray(pixels), jnp.asarray(tokens))

    mesh = get_mesh(data=4, model=2)
    model, state_tp = create_train_state(cfg, tcfg, mesh=mesh)
    # the qkv/mlp kernels actually live sharded over the model axis
    qkv = state_tp.params["params"]["visual"]["transformer"]["block_0"]["attn"]["qkv"]["kernel"]
    assert MODEL_AXIS in tuple(qkv.sharding.spec), qkv.sharding
    step_tp = make_train_step(model, mesh=mesh, state=state_tp)
    p_sh, t_sh = shard_train_batch(mesh, pixels, tokens)
    state_tp, loss_tp = step_tp(state_tp, p_sh, t_sh)

    assert float(loss_tp) == pytest.approx(float(loss_1), abs=1e-4)
    a = jax.tree_util.tree_leaves(state_1.params)
    b = jax.tree_util.tree_leaves(state_tp.params)
    worst = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(a, b))
    assert worst < 1e-4, worst


def test_batch_stream_skip_matches_consumed(tmp_path):
    """BatchStream.skip(n) must put the stream in exactly the state of
    having consumed n batches — same shuffle order AND same per-sample
    RandomResizedCrop draws — so a resumed run trains on identical data."""
    from lemon_tpu.cli.train_clip import batch_iterator
    from lemon_tpu.data.datasets import synthetic_captioning

    train, _, _ = synthetic_captioning(60, data_seed=0, noise_level=0.0)
    a = batch_iterator(train, 16, batch_size=8, image_size=32, seed=3)
    b = batch_iterator(train, 16, batch_size=8, image_size=32, seed=3)
    for _ in range(5):
        next(a)
    b.skip(5)
    for _ in range(3):
        ba, bb = next(a), next(b)
        np.testing.assert_array_equal(ba["pixels"], bb["pixels"])
        np.testing.assert_array_equal(ba["tokens"], bb["tokens"])


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    cfg = ClipConfig.tiny()
    tcfg = TrainConfig(warmup_steps=1, total_steps=2)
    model, state = create_train_state(cfg, tcfg)

    from lemon_tpu.train.contrastive import restore_params, save_checkpoint

    save_checkpoint(tmp_path / "ckpt", state, step=1)
    restored = restore_params(tmp_path / "ckpt")
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored)
    assert len(orig) == len(back)
    for x, y in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_preemption_checkpoint_roundtrip(tmp_path, monkeypatch):
    pytest.importorskip("orbax.checkpoint")
    monkeypatch.setenv("LEMON_TPU_PREEMPT_DIR", str(tmp_path))

    from lemon_tpu.train import preemption

    cfg = ClipConfig.tiny()
    tcfg = TrainConfig(warmup_steps=1, total_steps=2)
    model, state = create_train_state(cfg, tcfg)
    assert not preemption.has_checkpoint()
    assert preemption.save_checkpoint(state.params, step=7, extra={"rng": 123})
    assert preemption.has_checkpoint()
    restored, meta = preemption.load_checkpoint(jax.tree_util.tree_map(np.asarray, state.params))
    assert meta["step"] == 7 and meta["rng"] == 123
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_phase_timer():
    from lemon_tpu.core.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    d = t.as_dict()
    assert set(d) == {"a", "b"} and all(v >= 0 for v in d.values())


def test_early_stopping_utility():
    from lemon_tpu.core.io import EarlyStopping

    es = EarlyStopping(patience=2, mode="max")
    es.seed(-1.0, "init")
    assert es.step(0.5, "a") and es.best_payload == "a"
    assert not es.step(0.4, "b") and es.best_payload == "a"
    assert not es.should_stop
    assert not es.step(0.3, "c")
    assert es.should_stop and es.best == 0.5

    es = EarlyStopping(patience=1, mode="min")
    es.seed(float("inf"), "init")
    assert es.best_payload == "init" and not es.should_stop
    assert not es.step(float("inf"), "worse")  # non-improving inf keeps seed
    assert es.best_payload == "init" and es.should_stop


def test_checkpoint_writer_full_state_resume(tmp_path):
    """CheckpointWriter snapshots the full TrainState (params + optimizer
    moments + step) and restores it sharding-aware on the mesh — the
    distributed-checkpointing path (ROADMAP #8)."""
    pytest.importorskip("orbax.checkpoint")
    from lemon_tpu.core.mesh import get_mesh
    from lemon_tpu.train.contrastive import CheckpointWriter, make_train_step, restore_params

    cfg = ClipConfig.tiny()
    tcfg = TrainConfig(warmup_steps=1, total_steps=4, batch_size=8)
    mesh = get_mesh(8, 1)
    model, state = create_train_state(cfg, tcfg, mesh=mesh)
    step_fn = make_train_step(model, mesh=mesh)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((8, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (8, cfg.context_length)).astype(np.int32))
    state, _ = step_fn(state, pixels, tokens)  # nonzero adam moments

    with CheckpointWriter(tmp_path / "ckpt") as writer:
        writer.save(1, state)
    with CheckpointWriter(tmp_path / "ckpt") as writer:
        assert writer.latest_step() == 1
        _, template = create_train_state(cfg, tcfg, mesh=mesh)
        restored = writer.restore(template)
    assert int(restored.step) == int(state.step) == 1
    for x, y in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree_util.tree_leaves(state.opt_state), jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # params-only view stays compatible with the registry loader
    params_view = restore_params(tmp_path / "ckpt")
    for x, y in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(params_view)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_loop_resume_continues_from_checkpoint(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from lemon_tpu.train.contrastive import train_loop

    cfg = ClipConfig.tiny()
    tcfg = TrainConfig(warmup_steps=1, total_steps=4, batch_size=4, save_interval=2)
    rng = np.random.default_rng(0)
    batches = [
        {
            "pixels": rng.standard_normal((4, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32),
            "tokens": rng.integers(1, cfg.vocab_size, (4, cfg.context_length)).astype(np.int32),
        }
        for _ in range(4)
    ]
    model, state = create_train_state(cfg, tcfg)
    full = train_loop(model, state, iter(batches), tcfg, ckpt_dir=tmp_path / "c1")

    # interrupted run: stop after the step-2 checkpoint...
    model2, state2 = create_train_state(cfg, tcfg)
    short_cfg = TrainConfig(warmup_steps=1, total_steps=3, batch_size=4, save_interval=2)
    train_loop(model2, state2, iter(batches), short_cfg, ckpt_dir=tmp_path / "c2")
    # ...then resume to completion; must equal the uninterrupted run
    _, state3 = create_train_state(cfg, tcfg)
    resumed = train_loop(model2, state3, iter(batches), tcfg, ckpt_dir=tmp_path / "c2", resume=True)
    for x, y in zip(jax.tree_util.tree_leaves(full.params), jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7)
