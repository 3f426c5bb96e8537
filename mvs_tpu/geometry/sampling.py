"""Bilinear sampling (the TPU-friendly replacement for torch grid_sample).

We sample directly in *pixel* coordinates (no [-1, 1] normalization round-trip)
with zero padding outside the image, matching the geometric intent of the
reference's grid_sample calls (reference MVSNet/models/module.py:78-85).

Layout is channels-last: features (H, W, C), gathers pull whole C-vectors so
XLA lowers them to row gathers over a (H*W, C) matrix — the layout that keeps
the lane dimension contiguous on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bilinear_sample", "bilinear_sample_nearest_depth"]


def _gather_rows(flat_feat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """flat_feat (H*W, C), idx (...,) int32 -> (..., C)."""
    return jnp.take(flat_feat, idx, axis=0)


def bilinear_sample(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample `feat` (H, W, C) at `coords` (..., 2) = (x, y) pixels.

    Out-of-range samples contribute zeros (per-corner masking, so a sample
    half-in the image still gets the valid corners' weighted contribution —
    identical to grid_sample(padding_mode='zeros') corner semantics).
    """
    h, w, c = feat.shape
    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(feat.dtype)[..., None]
    wy = (y - y0).astype(feat.dtype)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def corner(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = _gather_rows(feat.reshape(h * w, c), flat)
        return vals * valid[..., None].astype(feat.dtype)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x1i)
    v10 = corner(y1i, x0i)
    v11 = corner(y1i, x1i)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def bilinear_sample_nearest_depth(depth: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample of a depth map (H, W) at (x, y) pixel coords.

    Used by the geometric-consistency check where interpolating across depth
    discontinuities would fabricate depths (reference MVSNet/eval.py:136-209
    uses nearest-style integer indexing).
    """
    h, w = depth.shape
    xi = jnp.clip(jnp.round(coords[..., 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(coords[..., 1]).astype(jnp.int32), 0, h - 1)
    return jnp.take(depth.reshape(-1), yi * w + xi, axis=0)
