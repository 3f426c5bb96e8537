"""Projection-matrix utilities.

Conventions (shared across the whole framework):
  * intrinsics K: (3, 3); extrinsics E: (4, 4) world-to-camera.
  * a "projection" P is the 4x4 matrix with K @ E[:3, :4] in the top 3 rows and
    E's last row preserved — the same packed form the reference passes around
    (reference MVSNet/datasets/dtu_yao.py:101-104).
  * pixel coordinates are (x, y) with x along width; depth is camera-frame z.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "compose_projection",
    "scale_intrinsics",
    "relative_projection",
    "invert_rigid",
]


def compose_projection(intrinsics: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pack K (..., 3, 3) and E (..., 4, 4) into the 4x4 projection form."""
    top = jnp.einsum("...ij,...jk->...ik", intrinsics, extrinsics[..., :3, :4])
    return jnp.concatenate([top, extrinsics[..., 3:4, :]], axis=-2)


def scale_intrinsics(intrinsics: jnp.ndarray, factor) -> jnp.ndarray:
    """Scale K's focal/principal rows for an image resize by `factor`."""
    scale = jnp.array([[factor], [factor], [1.0]], dtype=intrinsics.dtype)
    return intrinsics * scale


def invert_rigid(extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid 4x4 [R|t; 0 1] transform."""
    r = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3:4]
    r_t = jnp.swapaxes(r, -1, -2)
    top = jnp.concatenate([r_t, -r_t @ t], axis=-1)
    return jnp.concatenate([top, extrinsics[..., 3:4, :]], axis=-2)


def relative_projection(src_proj: jnp.ndarray, ref_proj: jnp.ndarray) -> jnp.ndarray:
    """P_src @ P_ref^{-1}: maps ref-camera homogeneous pixel·depth coords to src."""
    return src_proj @ jnp.linalg.inv(ref_proj)
