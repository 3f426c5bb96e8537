"""Train state + step factory, mesh-aware.

Replaces the reference's per-pipeline loops (MVSNet/train.py:123-201,
CasMVSNet/train.py:104-180, ...) with one jit-compiled step: forward, loss,
grad, optimizer update, metric reduction. Data parallelism comes from
sharding the batch over the mesh's 'data' axis — under jit, gradient psum and
cross-replica BatchNorm moments are inserted by GSPMD (no DDP wrapper, no
syncBN machinery)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.training import train_state as flax_train_state

__all__ = ["TrainState", "make_train_step", "make_eval_step"]


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None


def make_train_step(loss_and_metrics: Callable, donate: bool = True):
    """loss_and_metrics(params, batch_stats, batch, train=True) must return
    (loss, (new_batch_stats, metrics_dict)). Returns a jitted step fn."""

    def step(state: TrainState, batch):
        def loss_fn(params):
            return loss_and_metrics(params, state.batch_stats, batch)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(metrics_fn: Callable):
    """metrics_fn(params, batch_stats, batch) -> metrics dict; jitted."""

    def step(state: TrainState, batch):
        return metrics_fn(state.params, state.batch_stats, batch)

    return jax.jit(step)
