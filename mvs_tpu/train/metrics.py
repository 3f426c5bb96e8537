"""Depth-map quality metrics.

Matches the reference metric set (MVSNet/utils.py:130-158,
CasMVSNet/utils.py:126-159): masked absolute depth error (with optional error
band-pass) and threshold outlier rates at 2/4/8 mm.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["abs_depth_error", "threshold_error_rate", "standard_metrics",
           "interval_metrics"]


def _masked_mean(values, mask):
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def abs_depth_error(depth_est, depth_gt, mask, error_band=None):
    """Mean |est - gt| over valid pixels; error_band=(lo, hi) additionally
    restricts to pixels whose error lies in the band (reference
    AbsDepthError_metrics with thres)."""
    err = jnp.abs(depth_est - depth_gt)
    valid = mask > 0.5
    if error_band is not None:
        lo, hi = error_band
        valid = valid & (err >= lo) & (err < hi)
    return _masked_mean(err, valid)


def threshold_error_rate(depth_est, depth_gt, mask, thresh):
    """Fraction of valid pixels with |est - gt| > thresh (mm)."""
    err = jnp.abs(depth_est - depth_gt)
    return _masked_mean((err > thresh).astype(jnp.float32), mask > 0.5)


def interval_metrics(depth_est, depth_gt, mask, depth_interval,
                     prefix: str = ""):
    """Point-MVSNet's hypothesis-interval accuracy metrics: the fraction of
    valid pixels whose |err| is within 1x / 3x the per-sample depth-hypothesis
    interval (reference PointMVSNet/pointmvsnet/model.py:342-420, the
    '<1_pct'/'<3_pct' numbers that gate the flow stages).

    depth_interval: (B,) per-sample hypothesis spacing.
    """
    err = jnp.abs(depth_est - depth_gt)
    iv = depth_interval.reshape((-1,) + (1,) * (err.ndim - 1))
    valid = mask > 0.5
    return {
        f"{prefix}lt1_interval": _masked_mean((err < iv).astype(jnp.float32), valid),
        f"{prefix}lt3_interval": _masked_mean((err < 3 * iv).astype(jnp.float32), valid),
    }


def standard_metrics(depth_est, depth_gt, mask, prefix: str = ""):
    """The reference's validation metric dict: abs error + 2/4/8 mm rates."""
    return {
        f"{prefix}abs_depth_error": abs_depth_error(depth_est, depth_gt, mask),
        f"{prefix}thres2mm_error": threshold_error_rate(depth_est, depth_gt, mask, 2.0),
        f"{prefix}thres4mm_error": threshold_error_rate(depth_est, depth_gt, mask, 4.0),
        f"{prefix}thres8mm_error": threshold_error_rate(depth_est, depth_gt, mask, 8.0),
    }
