"""Point-based ops for Point-MVSNet: feature fetching and lattice kNN.

  * fetch_point_features — project world points into every view and bilinearly
    sample its feature map (reference PointMVSNet/pointmvsnet/utils/
    feature_fetcher.py:8-60). Uses the 0.5-centred pixel convention of the
    reference's get_pixel_grids (functions.py:128-138).
  * lattice_knn — k nearest neighbours among the 3D conv-lattice window around
    each point of a (D, H, W) point grid (reference utils/torch_utils.py:16-61
    computes the same thing with a sparse 375-channel conv; here it's
    window-shift subtraction, which the TPU VPU handles directly).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mvs_tpu.geometry.sampling import bilinear_sample

__all__ = ["point_pixel_grid", "fetch_point_features", "lattice_knn", "gather_neighbors"]


def point_pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel-centre coordinates (3, H*W): x,y at +0.5 centres."""
    xs = jnp.linspace(0.5, width - 0.5, width, dtype=dtype)
    ys = jnp.linspace(0.5, height - 0.5, height, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy, jnp.ones_like(gx)], axis=0).reshape(3, -1)


def fetch_point_features(
    feature_maps: jnp.ndarray,  # (V, H, W, C)
    pts: jnp.ndarray,  # (3, N) world points
    intrinsics: jnp.ndarray,  # (V, 3, 3)
    extrinsics: jnp.ndarray,  # (V, 4, 4) or (V, 3, 4)
) -> jnp.ndarray:
    """Sample each view's features at the projections of `pts` -> (V, N, C)."""
    v = feature_maps.shape[0]
    r = extrinsics[:, :3, :3]
    t = extrinsics[:, :3, 3:4]
    cam = jnp.einsum("vij,jn->vin", r, pts) + t  # (V, 3, N)
    z = cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    norm_uv = jnp.stack(
        [cam[:, 0] / safe_z, cam[:, 1] / safe_z, jnp.ones_like(z)], axis=1
    )  # (V, 3, N)
    uv = jnp.einsum("vij,vjn->vin", intrinsics, norm_uv)[:, :2]  # (V, 2, N)
    # 0.5-centred pixels -> array coords.
    coords = jnp.moveaxis(uv, 1, 2) - 0.5  # (V, N, 2)

    out = []
    for view in range(v):
        out.append(bilinear_sample(feature_maps[view], coords[view]))
    return jnp.stack(out, axis=0)  # (V, N, C)


def lattice_knn(xyz: jnp.ndarray, kernel_size: int = 3, k: int = 16) -> jnp.ndarray:
    """k nearest neighbours within the kernel_size^3 lattice window.

    xyz: (3, D, H, W) point coordinates on the hypothesis lattice.
    Returns flat int32 indices (N, k) into the flattened D*H*W point list
    (out-of-bounds window slots behave like the reference: distances are
    measured against zero padding and final indices are clamped).
    """
    _, d, h, w = xyz.shape
    hk = kernel_size // 2
    padded = jnp.pad(
        xyz, ((0, 0), (hk, hk), (hk, hk), (hk, hk)), mode="constant"
    )

    dists = []
    offsets = []
    for di in range(kernel_size):
        for dj in range(kernel_size):
            for dk in range(kernel_size):
                shifted = lax.dynamic_slice(
                    padded, (0, di, dj, dk), (3, d, h, w)
                )
                diff = xyz - shifted
                dists.append(jnp.sum(diff * diff, axis=0))  # (D, H, W)
                offsets.append(
                    (di - hk) * (h * w) + (dj - hk) * w + (dk - hk)
                )
    dist = jnp.stack(dists, axis=-1).reshape(-1, kernel_size**3)  # (N, k^3)
    offsets = jnp.asarray(offsets, dtype=jnp.int32)  # (k^3,)

    _, nn_idx = lax.top_k(-dist, k)  # (N, k) indices into the k^3 window
    base = jnp.arange(d * h * w, dtype=jnp.int32)[:, None]
    flat = base + offsets[nn_idx]
    return jnp.clip(flat, 0, d * h * w - 1)


def gather_neighbors(features: jnp.ndarray, nn_idx: jnp.ndarray) -> jnp.ndarray:
    """features (N, C), nn_idx (N, k) -> neighbour features (N, k, C).

    The XLA row-gather equivalent of the reference's gather_knn CUDA extension
    (PointMVSNet/pointmvsnet/functions/gather_knn.py:10-24); the backward pass
    is XLA's scatter-add of the same gather, so no custom VJP is needed.
    """
    return jnp.take(features, nn_idx, axis=0)
