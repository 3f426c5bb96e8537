"""Platform/device-count selection helpers.

The TPU plugin on some hosts registers itself regardless of JAX_PLATFORMS set
in the environment; only the jax.config route reliably overrides it before
backend initialization. MVS_TPU_CPU_DEVICES=N forces an N-device virtual CPU
mesh (used for sharding tests and CPU-only CLI runs)."""

from __future__ import annotations

import os

__all__ = ["ensure_platform"]


def ensure_platform() -> None:
    n_cpu = int(os.environ.get("MVS_TPU_CPU_DEVICES", "0"))
    if not n_cpu:
        return
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_cpu)
    except RuntimeError:
        pass  # backend already initialized; nothing we can do
