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

    The cache directory is namespaced by a host fingerprint (CPU feature
    flags + jax version): XLA's persistent cache will happily deserialize
    a CPU AOT executable compiled under a different machine-feature set,
    logging only "could lead to execution errors such as SIGILL" — and a
    cross-host stale cache was observed producing silently wrong numerics
    (14 golden-parity tests failed on entries written by a prior host,
    2026-08-21). A host or jax change now lands in a fresh subdirectory
    instead of loading foreign executables.
    """
    import hashlib
    import os

    if os.environ.get("LEMON_TPU_NO_COMPILE_CACHE"):
        return False
    import platform

    import jax

    base = str(
        path
        or os.environ.get("LEMON_TPU_CACHE_DIR")
        or os.path.expanduser("~/.cache/lemon_tpu/xla")
    )
    cpu_flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    cpu_flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    host_key = f"{platform.machine()}|{cpu_flags}|jax={jax.__version__}"
    path = os.path.join(base, hashlib.sha256(host_key.encode()).hexdigest()[:12])
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program, even fast-compiling ones (default threshold
        # skips sub-second compiles, which still cost a tunnel round-trip)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        return True
    except Exception:
        return False
