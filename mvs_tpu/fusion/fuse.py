"""Depth-map fusion into a point cloud (the fusibile / python-fuser equivalent).

Semantics match the reference python fuser (MVSNet/eval.py:212-326,
CasMVSNet/test.py:297-410): for each reference view,
  * photometric mask: confidence > conf_thresh;
  * geometric mask: the pixel's depth is consistent (reprojection < pixel_thresh
    px and < depth_thresh relative depth) with >= num_consistent source views;
  * fused depth: average of the ref depth and all consistent round-trip depths;
  * accepted pixels are unprojected to world points with the ref view's color.

Whole-scene fusion is ONE device program + ONE host readback: the pair list
is padded to a fixed (V, S) source-index matrix, consistency across all ref
views runs as a lax.map over refs of a vmap over sources (the fusibile
single-pass-scene shape, fusibile/fusibile.cu:322-440, instead of the
reference python fuser's per-ref-view host loop / process Pool,
CasMVSNet/test.py:432-444). Only the variable-size compaction of accepted
points happens on the host, from the already-fetched arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mvs_tpu.geometry.consistency import geometric_consistency
from mvs_tpu.geometry.homography import pixel_grid
from mvs_tpu.geometry.projection import invert_rigid

__all__ = ["fuse_view", "fuse_depth_maps", "fuse_scene", "FusionConfig"]


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


def _scene_fusion_impl(depths, confs, intrinsics, extrinsics, src_idx,
                       src_valid, conf_thresh: float, num_consistent: int,
                       pixel_thresh: float, depth_thresh: float,
                       depth_mode: str):
    """All ref views' consistency + averaging + unprojection in ONE program.

    src_idx (V, S) int32 source-view ids per ref view (pair list padded to a
    fixed S); src_valid (V, S) {0,1} marks real entries. Returns
    (mask (V, H, W) bool, world (V, H, W, 3)). lax.map over ref views keeps
    peak memory at one ref view's (S, H, W) stack while remaining a single
    compiled program (the fusibile whole-scene pass, fusibile.cu:322-440).
    """

    def per_ref(ref_i):
        rd, ri, re = depths[ref_i], intrinsics[ref_i], extrinsics[ref_i]
        sids = src_idx[ref_i]
        masks, depths_rt = jax.vmap(
            lambda sd, si, se: geometric_consistency(
                rd, ri, re, sd, si, se, pixel_thresh=pixel_thresh,
                depth_thresh=depth_thresh, depth_mode=depth_mode,
            )
        )(depths[sids], intrinsics[sids], extrinsics[sids])
        valid = src_valid[ref_i][:, None, None]
        geo_count = (masks.astype(depths.dtype) * valid).sum(axis=0)
        depth_sum = (depths_rt * valid).sum(axis=0)
        avg_depth = (depth_sum + rd) / (geo_count + 1)
        accept = (
            (geo_count >= num_consistent)
            & (confs[ref_i] > conf_thresh)
            & (rd > 0)
        )
        world = _unproject_view(avg_depth, ri, re).reshape(*rd.shape, 3)
        return accept, world

    return jax.lax.map(per_ref, jnp.arange(depths.shape[0]))


_scene_fusion = jax.jit(
    _scene_fusion_impl,
    static_argnames=("conf_thresh", "num_consistent", "pixel_thresh",
                     "depth_thresh", "depth_mode"),
)


def pad_pairs(pairs, num_views: int, max_s: int | None = None):
    """Pair list -> fixed (V, S) src-index matrix + {0,1} validity mask."""
    if max_s is None:
        max_s = max((len(s) for _, s in pairs), default=1) or 1
    src_idx = np.zeros((num_views, max_s), np.int32)
    src_valid = np.zeros((num_views, max_s), np.float32)
    for ref_view, src_views in pairs:
        k = len(src_views)
        src_idx[ref_view, :k] = src_views
        src_valid[ref_view, :k] = 1.0
    return src_idx, src_valid


def make_batched_scene_fusion(mesh, config: FusionConfig):
    """Scan-parallel fusion: S scans stacked on a leading axis, sharded over
    the mesh 'data' axis — each device fuses its own scans concurrently (the
    TPU-native form of the reference's multiprocessing Pool over scans,
    CasMVSNet/test.py:413-444; SURVEY §2.4 P5).

    Returns fn(depths (S,V,H,W), confs, intrinsics (S,V,3,3),
    extrinsics (S,V,4,4), src_idx (S,V,Smax), src_valid) ->
    (mask (S,V,H,W) bool, world (S,V,H,W,3)), compiled once per shape group.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data"))

    inner = partial(
        _scene_fusion_impl,
        conf_thresh=config.conf_thresh,
        num_consistent=config.num_consistent,
        pixel_thresh=config.pixel_thresh,
        depth_thresh=config.depth_thresh,
        depth_mode=config.depth_mode,
    )
    vm = jax.vmap(inner)
    return jax.jit(
        vm,
        in_shardings=(shard,) * 6,
        out_shardings=(shard, shard),
    )


def fuse_scene(depths, confs, intrinsics, extrinsics, pairs,
               config: FusionConfig | None = None):
    """Whole-scene fusion masks + world points: one device call, one readback.

    Returns (mask (V, H, W) bool ndarray, world (V, H, W, 3) ndarray). Views
    absent from `pairs` (or with empty source lists) get all-false masks.
    """
    config = config or FusionConfig()
    src_idx, src_valid = pad_pairs(pairs, len(depths))
    mask, world = _scene_fusion(
        jnp.asarray(depths), jnp.asarray(confs), jnp.asarray(intrinsics),
        jnp.asarray(extrinsics), jnp.asarray(src_idx), jnp.asarray(src_valid),
        conf_thresh=config.conf_thresh, num_consistent=config.num_consistent,
        pixel_thresh=config.pixel_thresh, depth_thresh=config.depth_thresh,
        depth_mode=config.depth_mode,
    )
    return np.asarray(mask), np.asarray(world)


def fuse_depth_maps(depths, confs, images, intrinsics, extrinsics, pairs,
                    config: FusionConfig | None = None):
    """Fuse a whole scene.

    Args:
      depths: (V, H, W) float32; confs: (V, H, W); images: (V, H, W, 3) in [0,1]
        or None; intrinsics (V,3,3); extrinsics (V,4,4);
      pairs: [(ref_view, [src_views...]), ...] (io.read_pair_file format).
    Returns (xyz (N,3) float32, rgb (N,3) uint8 or None).
    """
    mask, world = fuse_scene(depths, confs, intrinsics, extrinsics, pairs,
                             config)
    all_xyz, all_rgb = [], []
    for ref_view, src_views in pairs:
        if not src_views:
            continue
        m = mask[ref_view]
        all_xyz.append(world[ref_view][m])
        if images is not None:
            img = np.asarray(images[ref_view])
            all_rgb.append((np.clip(img[m], 0, 1) * 255).astype(np.uint8))

    xyz = np.concatenate(all_xyz, axis=0) if all_xyz else np.zeros((0, 3), np.float32)
    rgb = np.concatenate(all_rgb, axis=0) if all_rgb else None
    return xyz.astype(np.float32), rgb
