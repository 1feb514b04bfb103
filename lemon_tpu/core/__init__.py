from lemon_tpu.core.mesh import get_mesh, local_device_count, shard_batch
from lemon_tpu.core.precision import Precision, default_precision


def enable_compilation_cache(path=None) -> bool:
    """Turn on JAX's persistent compilation cache (opt-out via
    LEMON_TPU_NO_COMPILE_CACHE=1).

    Repeated pipeline runs recompile the same ViT/kNN programs. The cache
    persists executables under ``path`` (default ``$LEMON_TPU_CACHE_DIR``
    or ``~/.cache/lemon_tpu/xla``) across processes. The reference has no
    analog (torch eager). Returns False when disabled or unsupported.

    Measured effective on CPU and standard (local PJRT) TPU runtimes.
    NOT effective through the axon remote-TPU relay: compilation happens
    server-side there, so the client-side cache can't capture it (probed:
    185s first-call wall on both a cold and a warm cache).
    """
    import os

    if os.environ.get("LEMON_TPU_NO_COMPILE_CACHE"):
        return False
    import jax

    path = str(
        path
        or os.environ.get("LEMON_TPU_CACHE_DIR")
        or os.path.expanduser("~/.cache/lemon_tpu/xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program, even fast-compiling ones (default threshold
        # skips sub-second compiles, which still cost a tunnel round-trip)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        return True
    except Exception:
        return False
