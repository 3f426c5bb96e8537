"""Cross-view geometric consistency (the core of depth-map fusion).

Semantics match the reference's reproject-and-return check
(reference MVSNet/eval.py:136-209, CasMVSNet/test.py:239-294): for every ref
pixel with depth d, unproject to 3D, project into a source view, read the
source's predicted depth there, unproject *that* and project back into the
reference. The pixel is consistent with the source if the round trip lands
within `pixel_thresh` pixels and the round-trip depth is within
`depth_thresh` relative error.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mvs_tpu.geometry.homography import pixel_grid
from mvs_tpu.geometry.projection import invert_rigid
from mvs_tpu.geometry.sampling import bilinear_sample

__all__ = ["ReprojectionResult", "reproject_with_depth", "geometric_consistency"]


class ReprojectionResult(NamedTuple):
    depth_reprojected: jnp.ndarray  # (H, W) ref-frame depth after the round trip
    coords_reprojected: jnp.ndarray  # (H, W, 2) ref-frame pixel coords after round trip
    coords_src: jnp.ndarray  # (H, W, 2) where each ref pixel lands in the src view


def _unproject(depth: jnp.ndarray, intrinsics: jnp.ndarray, extrinsics: jnp.ndarray,
               pix: jnp.ndarray) -> jnp.ndarray:
    """Pixels (3, N) at depths (N,) -> world points (3, N)."""
    cam_pts = jnp.linalg.inv(intrinsics) @ (pix * depth[None])
    cam_h = jnp.concatenate([cam_pts, jnp.ones_like(cam_pts[:1])], axis=0)
    world = invert_rigid(extrinsics) @ cam_h
    return world[:3]


def _project(world: jnp.ndarray, intrinsics: jnp.ndarray, extrinsics: jnp.ndarray):
    """World points (3, N) -> (pixel coords (2, N), camera depth (N,))."""
    world_h = jnp.concatenate([world, jnp.ones_like(world[:1])], axis=0)
    cam = (extrinsics @ world_h)[:3]
    img = intrinsics @ cam
    z = img[2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    return img[:2] / safe_z, cam[2]


def reproject_with_depth(
    depth_ref: jnp.ndarray, intr_ref: jnp.ndarray, extr_ref: jnp.ndarray,
    depth_src: jnp.ndarray, intr_src: jnp.ndarray, extr_src: jnp.ndarray,
) -> ReprojectionResult:
    h, w = depth_ref.shape
    pix = pixel_grid(h, w).reshape(3, -1)  # (3, N)

    # ref -> world -> src image plane
    world = _unproject(depth_ref.reshape(-1), intr_ref, extr_ref, pix)
    src_xy, _ = _project(world, intr_src, extr_src)
    coords_src = src_xy.T.reshape(h, w, 2)

    # read the source's depth estimate where we landed
    sampled = bilinear_sample(depth_src[..., None], coords_src)[..., 0]

    # src -> world -> back into ref
    src_pix = jnp.concatenate([src_xy, jnp.ones_like(src_xy[:1])], axis=0)
    world_rt = _unproject(sampled.reshape(-1), intr_src, extr_src, src_pix)
    ref_xy, ref_z = _project(world_rt, intr_ref, extr_ref)

    return ReprojectionResult(
        depth_reprojected=ref_z.reshape(h, w),
        coords_reprojected=ref_xy.T.reshape(h, w, 2),
        coords_src=coords_src,
    )


def geometric_consistency(
    depth_ref: jnp.ndarray, intr_ref: jnp.ndarray, extr_ref: jnp.ndarray,
    depth_src: jnp.ndarray, intr_src: jnp.ndarray, extr_src: jnp.ndarray,
    pixel_thresh: float = 1.0, depth_thresh: float = 0.01,
    depth_mode: str = "relative",
):
    """Returns (mask (H,W) bool, round-trip depth (H,W) zeroed where inconsistent).

    depth_mode 'relative': |Δd|/d_ref < depth_thresh (python fuser);
    'absolute': |Δd| < depth_thresh (fusibile disp_thresh semantics).
    """
    h, w = depth_ref.shape
    res = reproject_with_depth(depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src)
    grid = pixel_grid(h, w)
    dist = jnp.linalg.norm(res.coords_reprojected - grid[:2].transpose(1, 2, 0), axis=-1)
    depth_diff = jnp.abs(res.depth_reprojected - depth_ref)
    if depth_mode == "relative":
        depth_err = depth_diff / jnp.maximum(depth_ref, 1e-6)
    else:
        depth_err = depth_diff
    mask = (dist < pixel_thresh) & (depth_err < depth_thresh) & (depth_ref > 0)
    return mask, jnp.where(mask, res.depth_reprojected, 0.0)
