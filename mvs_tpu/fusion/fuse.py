"""Depth-map fusion into a point cloud (the fusibile / python-fuser equivalent).

Semantics match the reference python fuser (MVSNet/eval.py:212-326,
CasMVSNet/test.py:297-410): for each reference view,
  * photometric mask: confidence > conf_thresh;
  * geometric mask: the pixel's depth is consistent (reprojection < pixel_thresh
    px and < depth_thresh relative depth) with >= num_consistent source views;
  * fused depth: average of the ref depth and all consistent round-trip depths;
  * accepted pixels are unprojected to world points with the ref view's color.

The per-view consistency/averaging compute is one jit-compiled call with a
static source count (fixed shapes); the variable-size compaction of accepted
points happens on the host. Fusion across reference views is embarrassingly
parallel (the reference used a process Pool, CasMVSNet/test.py:432-444; here
scan/view parallelism belongs to the mesh — see mvs_tpu.parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mvs_tpu.geometry.consistency import geometric_consistency
from mvs_tpu.geometry.homography import pixel_grid
from mvs_tpu.geometry.projection import invert_rigid

__all__ = ["fuse_view", "fuse_depth_maps", "FusionConfig"]


class FusionConfig:
    """Thresholds pinned by the reference configs (BASELINE.md fusion row).

    depth_mode:
      'relative' — round-trip depth within depth_thresh fraction of the ref
        depth (the reference python fuser, MVSNet/eval.py:206);
      'absolute' — round-trip depth within depth_thresh distance units
        (fusibile's disp_thresh semantics: the gipuma bridge writes depths
        straight into disp.dmb, so its 0.25 "disparity" threshold is an
        absolute depth threshold — CasMVSNet/gipuma.py:153-189,
        fusibile/fusibile.cu:179-253).
    """

    def __init__(self, conf_thresh: float = 0.8, num_consistent: int = 3,
                 pixel_thresh: float = 1.0, depth_thresh: float = 0.01,
                 depth_mode: str = "relative"):
        assert depth_mode in ("relative", "absolute"), depth_mode
        self.conf_thresh = conf_thresh
        self.num_consistent = num_consistent
        self.pixel_thresh = pixel_thresh
        self.depth_thresh = depth_thresh
        self.depth_mode = depth_mode


@partial(jax.jit, static_argnames=("pixel_thresh", "depth_thresh", "depth_mode"))
def _view_consistency(ref_depth, ref_intr, ref_extr, src_depths, src_intrs,
                      src_extrs, pixel_thresh: float, depth_thresh: float,
                      depth_mode: str = "relative"):
    """Vectorized consistency of one ref view against S source views.

    Returns (geo_count (H,W), depth_sum (H,W)) where depth_sum accumulates the
    consistent round-trip depths.
    """
    masks, depths_rt = jax.vmap(
        lambda sd, si, se: geometric_consistency(
            ref_depth, ref_intr, ref_extr, sd, si, se,
            pixel_thresh=pixel_thresh, depth_thresh=depth_thresh,
            depth_mode=depth_mode,
        )
    )(src_depths, src_intrs, src_extrs)
    return masks.sum(axis=0).astype(jnp.int32), depths_rt.sum(axis=0)


@jax.jit
def _unproject_view(depth, intr, extr):
    """(H, W) depth -> (H*W, 3) world points."""
    h, w = depth.shape
    pix = pixel_grid(h, w).reshape(3, -1)
    cam = jnp.linalg.inv(intr) @ (pix * depth.reshape(1, -1))
    cam_h = jnp.concatenate([cam, jnp.ones_like(cam[:1])], axis=0)
    world = (invert_rigid(extr) @ cam_h)[:3]
    return world.T


def fuse_view(ref_idx: int, src_idxs, depths, confs, intrinsics, extrinsics,
              config: FusionConfig):
    """Fuse one reference view. Returns (xyz (M,3), mask (H,W) bool) on host."""
    src_idxs = np.asarray(src_idxs, dtype=np.int32)
    geo_count, depth_sum = _view_consistency(
        depths[ref_idx], intrinsics[ref_idx], extrinsics[ref_idx],
        depths[src_idxs], intrinsics[src_idxs], extrinsics[src_idxs],
        pixel_thresh=config.pixel_thresh, depth_thresh=config.depth_thresh,
        depth_mode=config.depth_mode,
    )
    geo_mask = np.asarray(geo_count) >= config.num_consistent
    photo_mask = np.asarray(confs[ref_idx]) > config.conf_thresh
    mask = geo_mask & photo_mask & (np.asarray(depths[ref_idx]) > 0)

    avg_depth = (np.asarray(depth_sum) + np.asarray(depths[ref_idx])) / (
        np.asarray(geo_count) + 1
    )
    world = np.asarray(
        _unproject_view(jnp.asarray(avg_depth), intrinsics[ref_idx],
                        extrinsics[ref_idx])
    ).reshape(*mask.shape, 3)
    return world[mask], mask


def fuse_depth_maps(depths, confs, images, intrinsics, extrinsics, pairs,
                    config: FusionConfig | None = None):
    """Fuse a whole scene.

    Args:
      depths: (V, H, W) float32; confs: (V, H, W); images: (V, H, W, 3) in [0,1]
        or None; intrinsics (V,3,3); extrinsics (V,4,4);
      pairs: [(ref_view, [src_views...]), ...] (io.read_pair_file format).
    Returns (xyz (N,3) float32, rgb (N,3) uint8 or None).
    """
    config = config or FusionConfig()
    depths = jnp.asarray(depths)
    confs = jnp.asarray(confs)
    intrinsics = jnp.asarray(intrinsics)
    extrinsics = jnp.asarray(extrinsics)

    all_xyz, all_rgb = [], []
    for ref_view, src_views in pairs:
        if not src_views:
            continue
        xyz, mask = fuse_view(ref_view, src_views, depths, confs, intrinsics,
                              extrinsics, config)
        all_xyz.append(xyz)
        if images is not None:
            img = np.asarray(images[ref_view])
            all_rgb.append((np.clip(img[mask], 0, 1) * 255).astype(np.uint8))

    xyz = np.concatenate(all_xyz, axis=0) if all_xyz else np.zeros((0, 3), np.float32)
    rgb = np.concatenate(all_rgb, axis=0) if all_rgb else None
    return xyz.astype(np.float32), rgb
