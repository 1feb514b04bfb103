"""Device mesh and sharding helpers.

The reference has no intra-job parallelism (single CUDA device, no
torch.distributed; see /root/reference/run_lemon.py:92). Here the mesh is a
first-class citizen: every batched computation (embedding, kNN search,
contrastive training) is expressed over a 1-2D ``jax.sharding.Mesh`` whose
axes are

- ``data``  : batch / query axis (pure data parallelism)
- ``model`` : database axis for sharded kNN, feature axis if ever needed

On a single chip the mesh is (1, 1) and everything degrades to plain jit.
"""

from __future__ import annotations

import functools
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return jax.local_device_count()


@functools.lru_cache(maxsize=None)
def get_mesh(data: int = -1, model: int = 1, devices: tuple | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=-1`` uses all remaining devices on the data axis.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs more than {n} devices"
    arr = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading axis over the data axis, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_batch(x, mesh: Mesh):
    """Pad the leading axis to a multiple of the data-axis size and shard it.

    Returns ``(sharded_array, original_length)``; padded rows are zeros and the
    caller slices them off after gathering results.
    """
    n = x.shape[0]
    d = mesh.shape[DATA_AXIS]
    n_pad = pad_to_multiple(n, d)
    if n_pad != n:
        pad_width = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(np.asarray(x), pad_width)
    sharded = jax.device_put(x, data_sharding(mesh, x.ndim))
    return sharded, n


def distributed_init() -> bool:
    """Initialize ``jax.distributed`` for multi-host runs (ROADMAP #8).

    Reads the standard coordinator env vars (JAX auto-detects on Cloud TPU
    pods; Slurm multi-node runs set LEMON_TPU_COORDINATOR explicitly:
    ``host:port`` plus SLURM_NTASKS/SLURM_PROCID). No-op — returning False
    — on single-host runs, so callers can invoke it unconditionally.
    Required before building a multi-host mesh or multi-host orbax
    checkpointing (train/contrastive.py:CheckpointWriter).
    """
    import os

    coord = os.environ.get("LEMON_TPU_COORDINATOR")
    in_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if coord is None and not in_pod:
        return False
    if jax._src.distributed.global_state.client is not None:  # already up
        return True
    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ.get("SLURM_NTASKS", os.environ.get("LEMON_TPU_NUM_PROCS", "1"))),
            process_id=int(os.environ.get("SLURM_PROCID", os.environ.get("LEMON_TPU_PROC_ID", "0"))),
        )
    else:
        jax.distributed.initialize()
    return True
