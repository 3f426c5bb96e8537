"""Checkpoint save/resume (orbax), epoch- or step-granular.

Replaces the reference's torch.save dicts + latest-file scan
(MVSNet/train.py:100-119,158-165) and PointMVSNet's Checkpointer tag file
(pointmvsnet/utils/checkpoint.py:8-84). Orbax writes sharded arrays natively,
so multi-host checkpoints need no rank-0 gather."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 5):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        import jax

        # Gather to host numpy before writing: the checkpoint then carries no
        # device shardings and restores on any topology (train on an 8-chip
        # mesh, infer on 1 chip). Model sizes here make the gather cheap.
        host_state = jax.device_get(state)
        self._mgr.save(
            step, args=ocp.args.StandardSave(host_state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: int | None = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def restore_raw(self, step: int | None = None) -> Any:
        """Restore without a target template — the saved pytree as plain
        dicts/arrays (checkpoints are written as host numpy, so this works on
        any device topology)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def close(self):
        self._mgr.close()
