"""Differentiable plane-sweep homography warping.

Math (identical in all five reference pipelines, e.g. reference
MVSNet/models/module.py:46-87, CasMVSNet/models/module.py:245-280):
for a reference pixel p = (x, y, 1) and hypothesis depth d, the source-view
pixel is the perspective division of

    (R, t) = P_src @ P_ref^{-1};   q = R p d + t;   (x_s, y_s) = (q_x/q_z, q_y/q_z)

Supports both a shared depth ladder (D,) (MVSNet) and fully per-pixel depth
hypotheses (D, H, W) (cascade stages 2-3, pyramid refinement).
"""

from __future__ import annotations

import jax.numpy as jnp

from mvs_tpu.geometry.sampling import bilinear_sample

__all__ = ["pixel_grid", "plane_sweep_coords", "warp_src_feature"]


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinates (3, H, W) = [x; y; 1]."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    return jnp.stack([xs, ys, jnp.ones_like(xs)], axis=0)


def plane_sweep_coords(
    rel_proj: jnp.ndarray, depth_values: jnp.ndarray, height: int, width: int
) -> jnp.ndarray:
    """Source-view sampling coords for every (depth, pixel).

    Args:
      rel_proj: (4, 4) P_src @ P_ref^{-1}.
      depth_values: (D,) shared ladder or (D, H, W) per-pixel hypotheses.
    Returns:
      (D, H, W, 2) float (x, y) source pixel coordinates; points that land
      behind the source camera are pushed far out of range so zero-padding
      sampling drops them.
    """
    rot = rel_proj[:3, :3]
    trans = rel_proj[:3, 3]
    grid = pixel_grid(height, width, dtype=depth_values.dtype)  # (3, H, W)
    rot_xyz = jnp.einsum("ij,jhw->ihw", rot, grid)  # (3, H, W)

    if depth_values.ndim == 1:
        depth = depth_values[:, None, None]  # (D, 1, 1)
    else:
        depth = depth_values  # (D, H, W)

    q = rot_xyz[:, None] * depth[None] + trans[:, None, None, None]  # (3, D, H, W)
    z = q[2]
    valid = z > 1e-3
    safe_z = jnp.where(valid, z, 1.0)
    x = jnp.where(valid, q[0] / safe_z, -2.0 * width)
    y = jnp.where(valid, q[1] / safe_z, -2.0 * height)
    return jnp.stack([x, y], axis=-1)  # (D, H, W, 2)


def warp_src_feature(
    src_feat: jnp.ndarray, rel_proj: jnp.ndarray, depth_values: jnp.ndarray
) -> jnp.ndarray:
    """Warp one source feature map (H, W, C) over all depth hypotheses.

    Returns (D, H, W, C) — the plane-sweep volume for this source view.
    """
    h, w, _ = src_feat.shape
    coords = plane_sweep_coords(rel_proj, depth_values, h, w)
    return bilinear_sample(src_feat, coords)
