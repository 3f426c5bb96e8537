"""Depth-hypothesis generation for all sweep topologies.

Covers:
  * uniform global ladder             (reference MVSNet/train.py depth_values)
  * inverse-depth ladder              (reference CasMVSNet/colmap2mvsnet.py:379-393)
  * cascade per-pixel windows         (reference CasMVSNet/models/module.py:485-524)
  * pyramid residual hypotheses       (reference CVP-MVSNet/models/modules.py:122-219)
  * epipolar-geometry interval        (same, test branch — the reference's f64
    per-pixel solve reduces to a scalar mean interval, which we compute in a
    f32-safe closed form)
"""

from __future__ import annotations

import jax.numpy as jnp

from mvs_tpu.geometry.projection import compose_projection, relative_projection

__all__ = [
    "uniform_depth_values",
    "inverse_depth_values",
    "cascade_depth_samples",
    "residual_depth_hypotheses",
    "epipolar_depth_interval",
]


def uniform_depth_values(depth_min, depth_interval, num_depth: int, dtype=jnp.float32):
    """(D,) ladder: depth_min + i * depth_interval."""
    return depth_min + jnp.arange(num_depth, dtype=dtype) * depth_interval


def inverse_depth_values(depth_min, depth_max, num_depth: int, dtype=jnp.float32):
    """(D,) ladder uniform in 1/depth — denser near the camera."""
    inv = jnp.linspace(1.0 / depth_max, 1.0 / depth_min, num_depth, dtype=dtype)
    return (1.0 / inv)[::-1]


def cascade_depth_samples(
    cur_depth: jnp.ndarray,
    ndepth: int,
    depth_interval,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Per-pixel hypothesis windows for a cascade stage.

    Args:
      cur_depth: (D0,) global range endpoints (stage 1: uses [first, last]) or
        (H, W) previous-stage depth upsampled to this stage's resolution.
      ndepth: number of hypotheses this stage.
      depth_interval: per-hypothesis spacing for the windowed (per-pixel) case.
    Returns:
      (ndepth, H, W) depth hypotheses.
    """
    steps = jnp.arange(ndepth, dtype=jnp.float32)
    if cur_depth.ndim == 1:
        dmin = cur_depth[0]
        dmax = cur_depth[-1]
        interval = (dmax - dmin) / (ndepth - 1)
        ladder = dmin + steps * interval  # (ndepth,)
        return jnp.broadcast_to(ladder[:, None, None], (ndepth, height, width))
    # Per-pixel window centred on cur_depth: [d - n/2*i, d + n/2*i].
    lo = cur_depth - (ndepth / 2.0) * depth_interval  # (H, W)
    hi = cur_depth + (ndepth / 2.0) * depth_interval
    interval = (hi - lo) / (ndepth - 1)
    return lo[None] + steps[:, None, None] * interval[None]


def residual_depth_hypotheses(cur_depth: jnp.ndarray, interval, num_offsets: int = 4):
    """Pyramid refinement hypotheses: cur_depth + k*interval for k in [-n, n).

    cur_depth (H, W); interval scalar or (H, W). Returns (2n, H, W).
    """
    offsets = jnp.arange(-num_offsets, num_offsets, dtype=jnp.float32)  # (2n,)
    return cur_depth[None] + offsets[:, None, None] * jnp.asarray(interval)


def epipolar_depth_interval(
    ref_depth: jnp.ndarray,
    ref_intrinsics: jnp.ndarray,
    ref_extrinsics: jnp.ndarray,
    src_intrinsics: jnp.ndarray,
    src_extrinsics: jnp.ndarray,
    pixel_interval: float = 1.0,
) -> jnp.ndarray:
    """Scalar depth interval equivalent to a 1-pixel step along the epipolar line.

    Mirrors the reference's test-time estimate (CVP-MVSNet/models/modules.py:146-219),
    which — despite a per-pixel f64 linear solve — returns the *mean* |Δd| over
    all pixels. We solve the same 2-view relation in f32: project each ref pixel
    at its current depth into the source view, step `pixel_interval` along the
    epipolar direction, and recover the depth change Δd that explains the step.
    Returns a scalar jnp value (mean |Δd|).
    """
    h, w = ref_depth.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs, ys, ones], axis=0).reshape(3, -1)  # (3, N)
    d = ref_depth.reshape(-1)

    ref_proj = compose_projection(ref_intrinsics, ref_extrinsics)
    src_proj = compose_projection(src_intrinsics, src_extrinsics)
    rel = relative_projection(src_proj, ref_proj)
    rot, trans = rel[:3, :3], rel[:3, 3:4]

    # Source-view projections of the pixel at depth d and d+1 -> epipolar direction.
    q1 = rot @ (pix * d) + trans
    q2 = rot @ (pix * (d + 1.0)) + trans
    p1 = q1[:2] / q1[2:3]
    p2 = q2[:2] / q2[2:3]
    direction = p2 - p1
    norm = jnp.linalg.norm(direction, axis=0, keepdims=True)
    direction = direction / jnp.maximum(norm, 1e-8)
    p3 = p1 + direction * pixel_interval  # one pixel along the epipolar line

    # Solve for d' s.t. proj(pix * d') == p3:  (rot @ pix) d' + trans = z' * [p3; 1]
    a = rot @ pix  # (3, N)
    # x component: (a0 d' + t0) = p3x (a2 d' + t2)  ->  d' = (p3x t2 - t0) / (a0 - p3x a2)
    num = p3[0] * trans[2] - trans[0]
    den = a[0] - p3[0] * a[2]
    d_new = num / jnp.where(jnp.abs(den) > 1e-8, den, 1e-8)
    delta = jnp.abs(d_new - d)
    # Robust mean: ignore non-finite / absurd deltas from degenerate epipolar geometry.
    ok = jnp.isfinite(delta) & (delta < 1e4)
    return jnp.sum(jnp.where(ok, delta, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
