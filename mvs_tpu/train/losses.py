"""Losses for all model families.

  * masked smooth-L1 (reference MVSNet/models/mvsnet.py:201-203)
  * stage-weighted cascade loss (reference CasMVSNet/models/module.py:463-482)
  * pyramid multi-level loss (reference CVP-MVSNet/models/net.py:211-215)
  * OHEM top-k smooth-L1 (reference MVSNet_pl/losses.py:4-19)
  * interval-normalized MAE for PointFlow (reference PointMVSNet/pointmvsnet/networks.py:170-207)

All losses are pure functions over jnp arrays with a {0,1} float mask and are
safe under an all-masked batch (0/0 guarded).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "smooth_l1",
    "masked_smooth_l1",
    "cascade_loss",
    "pyramid_loss",
    "ohem_smooth_l1",
    "masked_mae",
]


def smooth_l1(err: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise huber: 0.5 e^2/beta for |e|<beta else |e|-0.5 beta."""
    abs_err = jnp.abs(err)
    return jnp.where(abs_err < beta, 0.5 * err * err / beta, abs_err - 0.5 * beta)


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_smooth_l1(depth_est, depth_gt, mask, beta: float = 1.0):
    return _masked_mean(smooth_l1(depth_est - depth_gt, beta), mask > 0.5)


def cascade_loss(stage_outputs: dict, depth_gt_stages: dict, mask_stages: dict,
                 stage_weights=(0.5, 1.0, 2.0)):
    """Σ_k w_k · smoothL1(stage_k). Keys 'stage1'..'stageN' in all dicts.

    Returns (total, last_stage_loss).
    """
    total = 0.0
    last = 0.0
    for i, w in enumerate(stage_weights):
        key = f"stage{i + 1}"
        if key not in stage_outputs:
            continue
        last = masked_smooth_l1(
            stage_outputs[key]["depth"], depth_gt_stages[key], mask_stages[key]
        )
        total = total + w * last
    return total, last


def pyramid_loss(depth_est_levels, depth_gt_levels, mask_levels):
    """Σ over pyramid levels of masked smooth-L1 (equal weights)."""
    total = 0.0
    for est, gt, mask in zip(depth_est_levels, depth_gt_levels, mask_levels):
        total = total + masked_smooth_l1(est, gt, mask)
    return total


def ohem_smooth_l1(depth_est, depth_gt, mask, topk_frac: float = 0.6):
    """Online hard-example mining: mean smooth-L1 over the hardest
    ``floor(topk_frac * n_valid)`` pixels, where n_valid counts VALID
    (masked-in) pixels — reference MVSNet_pl/losses.py:14-17 takes
    ``int(topk * loss.numel())`` of the already-masked loss vector. k is
    data-dependent, so instead of a static top-k we sort descending (invalid
    pixels pushed to -inf, i.e. past every valid entry) and average the
    entries whose rank < k."""
    err = smooth_l1(depth_est - depth_gt).reshape(-1)
    valid = (mask > 0.5).reshape(-1)
    err_sorted = jnp.sort(jnp.where(valid, err, -jnp.inf))[::-1]
    n_valid = jnp.sum(valid.astype(jnp.float32))
    k = jnp.maximum(jnp.floor(topk_frac * n_valid), 1.0)
    ranks = jnp.arange(err_sorted.shape[0], dtype=jnp.float32)
    take = (ranks < k) & jnp.isfinite(err_sorted)
    return (jnp.sum(jnp.where(take, err_sorted, 0.0))
            / jnp.maximum(jnp.sum(take.astype(jnp.float32)), 1.0))


def masked_mae(est, gt, mask, scale=1.0):
    """Mean |est-gt|/scale over the mask (PointFlow interval-normalized MAE)."""
    return _masked_mean(jnp.abs(est - gt) / scale, mask > 0.5)


def point_mvsnet_loss(preds: dict, gt_depth, depth_interval,
                      inter_scales=(0.75, 0.375)):
    """Coarse + per-flow interval-normalized MAE, averaged over terms.

    gt_depth (B, H, W) full-res with 0 = invalid; each term resizes the GT to
    the prediction's resolution (nearest, preserving the zero-invalid mask)
    and normalizes by its stage interval (reference
    PointMVSNet/pointmvsnet/model.py:308-339).
    """
    import jax

    def term(est, scale):
        b, h, w = est.shape
        gt = jax.image.resize(gt_depth, (b, h, w), method="nearest")
        mask = (gt > 0).astype(est.dtype)
        iv = depth_interval[:, None, None] * scale
        return _masked_mean(jnp.abs(est - gt) / iv, mask > 0.5)

    losses = {"coarse_loss": term(preds["coarse_depth"], 1.0)}
    for i, s in enumerate(inter_scales):
        key = f"flow{i + 1}"
        if key in preds:
            losses[f"{key}_loss"] = term(preds[key], s)
    total = sum(losses.values()) / len(losses)
    return total, losses
