"""Contrastive CLIP training (from scratch or fine-tune).

TPU-native counterpart of train_clip_from_scratch.py:

- Symmetric InfoNCE: mean of image->text and text->image cross-entropy
  against the batch diagonal (train_clip_from_scratch.py:161-167).
- **Global-batch semantics under data parallelism**: the batch is sharded
  over the mesh's data axis and the whole step is one pjit program — the
  (B, B) similarity matmul forces XLA to all-gather the other chips'
  features over ICI, so the loss is exactly the single-device global-batch
  loss (SURVEY.md §2c: 'the one place a collective changes semantics').
  No hand-written collectives; GSPMD inserts them.
- AdamW or SGD + cosine schedule with linear warmup
  (train_clip_from_scratch.py:133-140), orbax async checkpointing replacing
  ad-hoc ``checkpoint_{step}.pt`` files (:182-187).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from lemon_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from lemon_tpu.models.clip import ClipConfig, ClipModel, init_params


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 5e-5
    weight_decay: float = 0.05
    optimizer: str = "adamw"  # 'adamw' | 'sgd'
    momentum: float = 0.9
    warmup_steps: int = 1000
    total_steps: int = 100_000
    batch_size: int = 256
    save_interval: int = 5000
    seed: int = 0
    # 'fp32' (reference parity: torch trains fp32) | 'bf16' (TPU fast
    # path: bf16 compute, fp32 params/LN — ~3x the step rate on v5e)
    precision: str = "fp32"
    # Apply the optimizer over a single flattened parameter vector
    # (optax.flatten). Identical math; changes the opt-state checkpoint
    # layout, so resumes must use the same setting. Measured SLOWER on
    # v5e (full step 124 -> 150 ms at B=256: the ravel/unravel of
    # ~600MB trees outweighs the per-leaf overhead it removes —
    # benchmarks/probe_train.py); kept opt-in for profiling only.
    fused_optimizer: bool = False


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    if cfg.optimizer == "adamw":
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=cfg.momentum)
    else:
        raise ValueError(cfg.optimizer)
    return optax.flatten(tx) if cfg.fused_optimizer else tx


def clip_loss(logits_per_image: jnp.ndarray, logits_per_text: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE against the diagonal
    (train_clip_from_scratch.py:161-167)."""
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)
    li = optax.softmax_cross_entropy_with_integer_labels(logits_per_image, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits_per_text, labels).mean()
    return (li + lt) / 2.0


class TrainState(train_state.TrainState):
    pass


def _tp_spec(path, leaf) -> "jax.sharding.PartitionSpec":
    """Megatron-style tensor-parallel PartitionSpec for one parameter (or
    optimizer-moment) leaf, keyed on its tree-path suffix.

    Column-parallel first projections (fused qkv, mlp_fc) shard the output
    feature dim + bias over MODEL_AXIS; row-parallel second projections
    (attn out, mlp_proj) shard the input dim — GSPMD then inserts the
    all-reduce after each row-parallel matmul, the standard Megatron
    decomposition. Embeddings/LN/head projections replicate (tiny).
    Leaves whose sharded dim is not divisible by the axis size fall back
    to replication (correct, just not distributed).
    """
    from jax.sharding import PartitionSpec as P

    s = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 2:
        if s.endswith("attn/qkv/kernel") or s.endswith("mlp_fc/kernel"):
            return P(None, MODEL_AXIS)
        if s.endswith("attn/out/kernel") or s.endswith("mlp_proj/kernel"):
            return P(MODEL_AXIS, None)
    if ndim == 1 and (s.endswith("attn/qkv/bias") or s.endswith("mlp_fc/bias")):
        return P(MODEL_AXIS)
    return P()


def train_state_shardings(state, mesh):
    """NamedSharding tree for a TrainState under (data, model) parallelism:
    tensor-parallel specs when the mesh has a model axis > 1, pure
    replication otherwise. Applies uniformly to params AND the
    params-shaped optimizer moments (matched by path suffix)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def leaf_sharding(path, x):
        spec = _tp_spec(path, x) if tp else P()
        # divisibility fallback: replicate anything the axis can't split
        for dim, name in zip(getattr(x, "shape", ()), spec):
            if name == MODEL_AXIS and dim % n_model != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def create_train_state(model_cfg: ClipConfig, train_cfg: TrainConfig, mesh=None) -> Tuple[ClipModel, TrainState]:
    from lemon_tpu.core.precision import Precision

    prec = Precision.bf16() if train_cfg.precision == "bf16" else Precision()
    model, params = init_params(model_cfg, seed=train_cfg.seed, precision=prec)
    tx = make_optimizer(train_cfg)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if mesh is not None:
        # dp-only meshes replicate the state; a model axis > 1 places the
        # transformer projections tensor-parallel (train_state_shardings).
        state = jax.device_put(state, train_state_shardings(state, mesh))
    return model, state


def make_train_step(model: ClipModel, mesh=None, state=None):
    """One jitted training step. With a mesh, inputs shard over the data
    axis and the InfoNCE logits matmul triggers GSPMD all-gathers; if the
    mesh has a model axis > 1, pass ``state`` so the step pins its
    tensor-parallel shardings (train_state_shardings) on input and output
    — GSPMD then runs the projections Megatron-style with automatic
    all-reduces instead of re-replicating the params."""

    def step(state: TrainState, pixels: jnp.ndarray, tokens: jnp.ndarray):
        def loss_fn(params):
            logits_i, logits_t = model.apply(params, pixels, tokens)
            return clip_loss(logits_i, logits_t)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        return new_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(DATA_AXIS))
    if state is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        state_shardings = train_state_shardings(state, mesh)
    else:
        state_shardings = repl
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_sharded, batch_sharded),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )


def shard_train_batch(mesh, pixels: np.ndarray, tokens: np.ndarray):
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(pixels, s), jax.device_put(tokens, s)


# ---------------------------------------------------------------------------
# checkpointing (orbax, async, multi-host-aware)


class CheckpointWriter:
    """Persistent async orbax manager for the train loop (ROADMAP #8).

    - **Async**: saves return immediately; orbax commits in the background
      and ``close()`` / context-exit drains pending writes. The reference
      blocks training on every ``torch.save``
      (train_clip_from_scratch.py:182-187).
    - **Multi-host**: under ``jax.distributed`` every process calls
      ``save`` with the same global arrays; orbax writes each host's
      addressable shards and coordinates the atomic commit — no
      rank-0-only gating, no host gathers of device state.
    - **Exact resume**: the full TrainState (params + optimizer moments +
      step) is snapshotted, not just params.
    """

    def __init__(self, ckpt_dir: Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            Path(ckpt_dir).absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=self._ocp.args.StandardSave({"state": state}))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template_state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the template's dtypes/shapes/shardings — on a mesh
        each host reads only its own shards."""
        step = step if step is not None else self._mgr.latest_step()
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore({"state": template_state})
        )["state"]

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_checkpoint(ckpt_dir: Path, state: TrainState, step: int) -> None:
    """One-shot synchronous snapshot (train-loop users should prefer the
    persistent :class:`CheckpointWriter`)."""
    with CheckpointWriter(ckpt_dir) as writer:
        writer.save(step, state)


def restore_params(ckpt_dir: Path, step: Optional[int] = None):
    """Params-only view of a checkpoint (model-registry consumption).
    Accepts both the current full-TrainState layout and round-1's
    params-only layout."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        tree = mgr.restore(step)
    if isinstance(tree, dict) and "state" in tree:
        return tree["state"]["params"]
    return tree


def train_loop(
    model: ClipModel,
    state: TrainState,
    batches: Iterator[Dict[str, np.ndarray]],
    train_cfg: TrainConfig,
    mesh=None,
    ckpt_dir: Optional[Path] = None,
    log_every: int = 100,
    resume: bool = False,
):
    """Minimal driver: batches yield {'pixels': (B,H,W,3) f32, 'tokens':
    (B,L) i32}. Returns the final state. With ``resume`` and an existing
    checkpoint dir, restores the latest full TrainState (sharding-aware)
    and continues from the saved step; already-consumed batches are
    skipped so the data order matches an uninterrupted run."""
    step_fn = make_train_step(model, mesh=mesh, state=state)
    writer = CheckpointWriter(ckpt_dir) if ckpt_dir is not None else None
    start_step = 0
    if resume and writer is not None and writer.latest_step() is not None:
        state = writer.restore(state)
        start_step = writer.latest_step() + 1
        print(f"resumed from step {writer.latest_step()}")
    if start_step >= train_cfg.total_steps:
        # resuming a finished run is a no-op — without this clamp the loop
        # would train one extra step past total_steps and mutate the
        # checkpoint dir on every rerun
        print(f"already trained to step {start_step - 1} (total_steps={train_cfg.total_steps})")
        if writer is not None:
            writer.close()
        return state
    last_step = start_step - 1
    last_saved = None
    try:
        if start_step > 0 and hasattr(batches, "skip"):
            # Replay only the data-order bookkeeping for consumed batches
            # (cli/train_clip.py BatchStream) instead of fully assembling
            # and discarding them — resuming at a deep step otherwise
            # pays hours of decode/preprocess/tokenize for nothing.
            batches.skip(start_step)
            batches = enumerate(batches, start=start_step)
        else:
            batches = enumerate(batches)
        for step_idx, batch in batches:
            if step_idx < start_step:
                continue
            pixels = jnp.asarray(batch["pixels"])
            tokens = jnp.asarray(batch["tokens"])
            if mesh is not None:
                pixels, tokens = shard_train_batch(mesh, pixels, tokens)
            state, loss = step_fn(state, pixels, tokens)
            # only AFTER the step completes: an exception mid-step must
            # not let the finally-save label the pre-step state as
            # step_idx (a resume would then skip this batch)
            last_step = step_idx
            if step_idx % log_every == 0:
                print(f"step {step_idx}: loss {float(loss):.4f}")
            if writer is not None and step_idx > 0 and step_idx % train_cfg.save_interval == 0:
                writer.save(step_idx, state)
                last_saved = step_idx
            if step_idx + 1 >= train_cfg.total_steps:
                break
    finally:
        # Always persist the FINAL completed state: the interval save
        # misses the last steps (and short/debug runs entirely). This is
        # a deliberate improvement over the reference, which only saves
        # when batch_ct % save_interval == 0 inside the loop
        # (train_clip_from_scratch.py:182-187) and can end training with
        # an unsaved tail. Best-effort on
        # the exception path — a failed save (e.g. donated buffers after
        # an aborted dispatch) must not mask the original error or skip
        # draining pending async interval saves.
        if writer is not None:
            if last_step >= start_step and last_saved != last_step:
                try:
                    writer.save(last_step, state)
                except Exception as e:  # pragma: no cover - abort-path race
                    print(f"[lemon_tpu] WARNING: final checkpoint save failed: {e}")
            writer.close()
    return state
