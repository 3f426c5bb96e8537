"""Learning-rate schedules (optax) mirroring the reference's.

  * multistep "10,12,14:2" strings — epoch milestones with a decay divisor
    (reference MVSNet/train.py:40,125-127)
  * per-iteration warmup + multistep (reference CasMVSNet/utils.py:208-252:
    linear warmup from factor 1/3 over 500 iters, then stepwise decay)
  * warmup + cosine (reference MVSNet_pl/utils/__init__.py:29-46)
"""

from __future__ import annotations

import optax

__all__ = ["parse_milestones", "multistep_lr", "warmup_multistep_lr",
           "warmup_cosine_lr", "poly_lr"]


def parse_milestones(spec: str) -> tuple[list[int], float]:
    """'10,12,14:2' -> ([10, 12, 14], 0.5). The divisor defaults to 2."""
    if ":" in spec:
        steps, divisor = spec.split(":")
        gamma = 1.0 / float(divisor)
    else:
        steps, gamma = spec, 0.5
    return [int(s) for s in steps.split(",") if s], gamma


def multistep_lr(base_lr: float, milestones: list[int], gamma: float,
                 steps_per_epoch: int = 1) -> optax.Schedule:
    """Piecewise-constant decay at epoch milestones."""
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def warmup_multistep_lr(base_lr: float, milestones: list[int], gamma: float,
                        warmup_steps: int = 500,
                        warmup_factor: float = 1.0 / 3.0) -> optax.Schedule:
    """Linear warmup from base_lr*factor over warmup_steps, then multistep."""
    decay = optax.piecewise_constant_schedule(base_lr, {m: gamma for m in milestones})

    def schedule(step):
        import jax.numpy as jnp

        alpha = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        warm = warmup_factor * (1 - alpha) + alpha
        return decay(step) * jnp.where(step < warmup_steps, warm, 1.0)

    return schedule


def warmup_cosine_lr(base_lr: float, total_steps: int,
                     warmup_steps: int = 500) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=base_lr / 3.0, peak_value=base_lr,
        warmup_steps=warmup_steps, decay_steps=total_steps,
    )


def poly_lr(base_lr: float, total_steps: int, poly_exp: float = 0.9,
            warmup_steps: int = 0) -> optax.Schedule:
    """Polynomial decay: lr = base * (1 - step/total)^poly_exp, with an
    optional linear warmup (reference MVSNet_pl/opt.py:55-57 +
    utils/__init__.py:36-38, default exponent 0.9)."""

    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        lr = base_lr * (1.0 - frac) ** poly_exp
        if warmup_steps > 0:
            alpha = jnp.minimum(step / warmup_steps, 1.0)
            lr = lr * ((1.0 / 3.0) * (1 - alpha) + alpha)
        return lr

    return schedule
