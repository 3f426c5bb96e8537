"""Soft-argmin depth regression and photometric confidence.

Reference semantics: depth = Σ_d p(d)·depth(d) (MVSNet/models/module.py:91-103);
confidence = sum of the probability volume over a 4-tap window centred at the
regressed depth index (MVSNet/models/mvsnet.py:187-191).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["depth_regression", "photometric_confidence", "regress_depth_and_confidence"]


def depth_regression(prob: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Expected depth under prob (D, H, W); depth_values (D,) or (D, H, W) -> (H, W)."""
    if depth_values.ndim == 1:
        depth_values = depth_values[:, None, None]
    return jnp.sum(prob * depth_values, axis=0)


def photometric_confidence(prob: jnp.ndarray, depth_index: jnp.ndarray) -> jnp.ndarray:
    """4-tap sum of prob (D, H, W) around the (float) regressed index (H, W).

    Matches the reference's avg_pool(pad=(1,2)) + gather-at-index trick: the
    window covers indices {i-1, i, i+1, i+2} for i = round-down of the index.
    """
    d = prob.shape[0]
    idx = jnp.clip(depth_index, 0, d - 1).astype(jnp.int32)
    taps = jnp.stack([idx - 1, idx, idx + 1, idx + 2], axis=0)  # (4, H, W)
    valid = (taps >= 0) & (taps < d)
    taps = jnp.clip(taps, 0, d - 1)
    gathered = jnp.take_along_axis(prob, taps.reshape(4, *idx.shape), axis=0)
    return jnp.sum(gathered * valid.astype(prob.dtype), axis=0)


def regress_depth_and_confidence(
    cost: jnp.ndarray, depth_values: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """softmax(cost over D) -> (depth (H,W), confidence (H,W), prob (D,H,W)).

    `cost` is the regularized volume squeezed to (D, H, W); the reference
    applies softmax to the *negated* regularized cost — callers pass the score
    with "higher = more likely" orientation already applied.
    """
    prob = jax.nn.softmax(cost, axis=0)
    depth = depth_regression(prob, depth_values)

    # Confidence needs the regressed hypothesis *index*; with a shared ladder
    # that's linear in depth, with per-pixel hypotheses we regress the index
    # directly under the same distribution.
    d = cost.shape[0]
    index = depth_regression(
        jax.lax.stop_gradient(prob), jnp.arange(d, dtype=prob.dtype)
    )
    conf = photometric_confidence(jax.lax.stop_gradient(prob), index)
    return depth, conf, prob
