"""Plane-sweep cost-volume construction.

Two aggregation topologies, matching the reference family:
  * variance over views            (reference MVSNet/models/mvsnet.py:156-170)
  * group-wise correlation         (reference AACVP-MVSNet/models/AACVPMVSNet.py:108-136)

TPU-first design notes:
  * channels-last volumes (D, H, W, C) — C rides the 128-lane dimension and the
    trailing 3D convolution consumes NDHWC directly.
  * views are accumulated as running Σf / Σf² (never materializing V volumes),
    which makes the source-view axis shardable: partial sums are additive, so a
    view-sharded mesh finishes with one psum over the 'view' axis
    (see mvs_tpu.parallel.collectives).
"""

from __future__ import annotations

import jax.numpy as jnp

from mvs_tpu.geometry.homography import warp_src_feature

__all__ = [
    "variance_cost_volume",
    "group_correlation_cost_volume",
    "variance_from_partials",
    "get_warp_fn",
]


def get_warp_fn(sampler: str):
    """'gather' = exact grid-sample semantics (geometry.sampling);
    'hat' = gather-free two-pass hat-matmul warp (ops.hat_warp), the TPU
    fast path."""
    if sampler == "gather":
        return warp_src_feature
    if sampler == "hat":
        from mvs_tpu.ops.hat_warp import warp_src_feature_hat

        return warp_src_feature_hat
    raise ValueError(f"unknown sampler {sampler!r}")


def variance_cost_volume(
    ref_feat: jnp.ndarray,  # (H, W, C)
    src_feats: jnp.ndarray,  # (V, H, W, C)
    rel_projs: jnp.ndarray,  # (V, 4, 4) src @ ref^-1
    depth_values: jnp.ndarray,  # (D,) or (D, H, W)
    sampler: str = "gather",
    band_cfg: dict | None = None,
) -> jnp.ndarray:
    """Variance-aggregated cost volume (D, H, W, C) over ref + V source views.

    band_cfg (hat_banded only): overrides for tile_rows/tile_cols/band_h/
    band_w/depth_group/count_offband — the coverage budget of the banded warp
    (plumbed from ModelConfig so wide-baseline datasets can widen the band)."""
    if sampler == "hat":
        # Fully fused path: per-chunk warp + moment accumulation in one loop.
        from mvs_tpu.ops.hat_warp import fused_variance_volume_hat

        return fused_variance_volume_hat(ref_feat, src_feats, rel_projs,
                                         depth_values)
    if sampler == "hat_banded":
        # Tiled fused path: each output tile contracts only its (band_h,
        # band_w) source window instead of the full image — the production
        # TPU path at eval resolution (see ops.hat_warp).
        from mvs_tpu.ops.hat_warp import fused_variance_volume_banded

        return fused_variance_volume_banded(ref_feat, src_feats, rel_projs,
                                            depth_values, **(band_cfg or {}))

    num_views = src_feats.shape[0] + 1
    d = depth_values.shape[0]
    warp = get_warp_fn(sampler)

    ref_volume = jnp.broadcast_to(ref_feat[None], (d,) + ref_feat.shape)
    sum_f = ref_volume
    sum_sq = ref_volume * ref_volume
    # V is small (2-7) and static: unrolled at trace time; each iteration's
    # warped volume is consumed immediately so XLA frees it after the adds.
    for v in range(src_feats.shape[0]):
        warped = warp(src_feats[v], rel_projs[v], depth_values)
        sum_f = sum_f + warped
        sum_sq = sum_sq + warped * warped

    return variance_from_partials(sum_f, sum_sq, num_views)


def variance_from_partials(sum_f: jnp.ndarray, sum_sq: jnp.ndarray, num_views) -> jnp.ndarray:
    """variance = E[f^2] - E[f]^2 given additive partial sums (shardable)."""
    mean = sum_f / num_views
    return sum_sq / num_views - mean * mean


def group_correlation_cost_volume(
    ref_feat: jnp.ndarray,  # (H, W, C)
    src_feats: jnp.ndarray,  # (V, H, W, C)
    rel_projs: jnp.ndarray,  # (V, 4, 4)
    depth_values: jnp.ndarray,  # (D,) or (D, H, W)
    num_groups: int,
    sampler: str = "gather",
    band_cfg: dict | None = None,
) -> jnp.ndarray:
    """Group-wise correlation cost volume (D, H, W, G).

    similarity(g) = mean_c-in-g( warped_c * ref_c ), averaged over source views
    — additive over views, hence view-shardable exactly like the variance path.

    sampler 'hat_banded': the fused banded-tile path (shared machinery with
    the variance volume — ops.hat_warp) so AACVP refine levels get the same
    per-pixel-window speedup as the cascade stages.
    """
    if sampler == "hat_banded":
        from mvs_tpu.ops.hat_warp import fused_variance_volume_banded

        return fused_variance_volume_banded(
            ref_feat, src_feats, rel_projs, depth_values,
            mode="group_correlation", num_groups=num_groups,
            **(band_cfg or {}))
    h, w, c = ref_feat.shape
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    d = depth_values.shape[0]
    warp = get_warp_fn(sampler)
    ref_g = ref_feat.reshape(h, w, num_groups, c // num_groups)

    corr_sum = jnp.zeros((d, h, w, num_groups), dtype=ref_feat.dtype)
    for v in range(src_feats.shape[0]):
        warped = warp(src_feats[v], rel_projs[v], depth_values)
        warped_g = warped.reshape(d, h, w, num_groups, c // num_groups)
        corr_sum = corr_sum + jnp.mean(warped_g * ref_g[None], axis=-1)

    return corr_sum / src_feats.shape[0]
