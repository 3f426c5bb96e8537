"""Checkpoint save/resume (orbax), epoch- or step-granular.

Replaces the reference's torch.save dicts + latest-file scan
(MVSNet/train.py:100-119,158-165) and PointMVSNet's Checkpointer tag file
(pointmvsnet/utils/checkpoint.py:8-84). Orbax writes sharded arrays natively,
so multi-host checkpoints need no rank-0 gather."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "migrate_batch_stats"]


def migrate_batch_stats(batch_stats, assumed_count: float = 1.0e4):
    """Upgrade pre-debiased-BN checkpoints to the current format.

    The current Norm/FusedConvBlock3D keep zero-initialized EMA accumulators
    plus a 'count' scalar and debias at read time (nn/blocks.py). Older
    checkpoints stored plain EMA mean/var with no 'count'; restoring them
    as-is would read count=0 and silently fall back to identity statistics.
    This walks the tree and, wherever a dict holds 'mean'/'var' but no
    'count', synthesizes count=assumed_count (debias denom 1-m^1e4 == 1, so
    the stored values pass through unchanged — correct for converged EMAs).
    """
    import numpy as np

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            if "mean" in out and "var" in out and "count" not in out:
                out["count"] = np.asarray(assumed_count, np.float32)
            return out
        return node

    return walk(batch_stats) if batch_stats is not None else None


class CheckpointManager:
    """Orbax manager with an optional best-metric retention policy.

    With ``best_metric`` set, retention keeps the top ``max_to_keep``
    checkpoints ranked by that metric (``best_mode`` 'min' or 'max') — the
    role of MVSNet_pl's ModelCheckpoint(monitor='val/loss')
    (reference MVSNet_pl/train.py:180-183) and PointMVSNet's best-tracking
    Checkpointer (pointmvsnet/utils/checkpoint.py:8-84). Metrics are passed
    at save() time; saves without the metric (e.g. epochs with no val pass)
    fall back to recency."""

    def __init__(self, directory, max_to_keep: int = 5,
                 best_metric: str | None = None, best_mode: str = "min"):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self.best_metric = best_metric
        kwargs = {}
        if best_metric is not None:
            kwargs["best_fn"] = lambda m: (m or {}).get(
                best_metric, float("inf") if best_mode == "min" else float("-inf"))
            kwargs["best_mode"] = best_mode
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, **kwargs
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

    def best_step(self) -> int | None:
        """Step of the best checkpoint by the retention metric (None when no
        best_metric was configured or nothing was saved with the metric)."""
        try:
            return self._mgr.best_step()
        except Exception:
            return None

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
