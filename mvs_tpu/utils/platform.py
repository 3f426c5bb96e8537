"""Platform/device-count selection helpers.

The TPU plugin on some hosts registers itself regardless of JAX_PLATFORMS set
in the environment; only the jax.config route reliably overrides it before
backend initialization. MVS_TPU_CPU_DEVICES=N forces an N-device virtual CPU
mesh (used for sharding tests and CPU-only CLI runs)."""

from __future__ import annotations

import os

__all__ = ["ensure_platform"]


def ensure_platform() -> None:
    import jax

    # Persistent compilation cache: full-resolution MVS programs take minutes
    # to compile; share compilations across processes/invocations.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/mvs_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    n_cpu = int(os.environ.get("MVS_TPU_CPU_DEVICES", "0"))
    if not n_cpu:
        return
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_cpu)
    except RuntimeError:
        pass  # backend already initialized; nothing we can do
