"""Multi-host (multi-process) initialization.

The reference's multi-process entry is torch.distributed.init_process_group
over NCCL, driven by WORLD_SIZE/RANK env vars that torch.distributed.launch
sets (CasMVSNet/train.py:62-63,297-302). The JAX equivalent is
``jax.distributed.initialize``: after it, ``jax.devices()`` spans the whole
slice/pod, every host runs the same pjit program, and the data pipeline
shards its work by ``jax.process_index()`` (io.pipeline already does).

Launch paths this helper covers:

  * **TPU pods / GKE**: run the same command on every host with
    ``MVS_TPU_MULTIHOST=1``; ``jax.distributed.initialize()`` auto-discovers
    coordinator/rank from the TPU metadata, no explicit addresses needed.
  * **Explicit coordination** (CPU/GPU fleets, tests): set
    ``MVS_TPU_COORDINATOR=host:port``, ``MVS_TPU_NUM_PROCESSES`` and
    ``MVS_TPU_PROCESS_ID`` — the direct analogue of the reference's
    MASTER_ADDR/WORLD_SIZE/RANK triplet.

Idempotent and a no-op for single-process runs, so CLIs call it
unconditionally.
"""

from __future__ import annotations

import os

__all__ = ["maybe_initialize_distributed"]

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize JAX multi-process coordination when the env asks for it.

    Returns True when running (or now initialized) multi-process; False for
    plain single-process runs. Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return True

    coordinator = os.environ.get("MVS_TPU_COORDINATOR")
    auto = os.environ.get("MVS_TPU_MULTIHOST", "0") == "1"
    if not coordinator and not auto:
        return False

    import jax

    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=int(os.environ["MVS_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["MVS_TPU_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True
    if jax.process_index() == 0:
        print(f"jax.distributed initialized: {jax.process_count()} processes, "
              f"{jax.device_count()} devices")
    return True
