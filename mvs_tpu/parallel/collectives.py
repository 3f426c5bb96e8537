"""Explicit collectives for view-sharded cost volumes and metric reduction.

The variance cost volume is additive over source views (Σf, Σf² — see
mvs_tpu.ops.cost_volume), so sharding the source-view axis across the mesh
needs exactly one psum of the partial sums. This module provides the
shard_map-level implementation; under plain pjit the same result falls out of
GSPMD, but the explicit version pins the communication pattern (one psum over
'view', riding ICI) instead of trusting the partitioner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mvs_tpu.geometry.homography import warp_src_feature
from mvs_tpu.ops.cost_volume import variance_from_partials

__all__ = ["view_sharded_variance_volume", "psum_metrics"]


def view_sharded_variance_volume(
    mesh: Mesh,
    ref_feat: jnp.ndarray,  # (H, W, C) replicated
    src_feats: jnp.ndarray,  # (V, H, W, C), V divisible by mesh 'view' size
    rel_projs: jnp.ndarray,  # (V, 4, 4)
    depth_values: jnp.ndarray,  # (D,) or (D, H, W) replicated
    num_views_total: int | None = None,
) -> jnp.ndarray:
    """Variance cost volume with the source-view axis sharded over 'view'.

    Each shard warps its local views and accumulates partial Σf/Σf²; a single
    psum over the 'view' axis completes the moments. The reference view's
    contribution is added once (on the shard with index 0).
    """
    num_views = (num_views_total or (src_feats.shape[0] + 1))

    def shard_fn(ref, srcs, rels, depths):
        # srcs: (V_local, H, W, C) — this shard's views.
        d = depths.shape[0]
        sum_f = jnp.zeros((d,) + ref.shape, ref.dtype)
        sum_sq = jnp.zeros_like(sum_f)
        for v in range(srcs.shape[0]):
            warped = warp_src_feature(srcs[v], rels[v], depths)
            sum_f = sum_f + warped
            sum_sq = sum_sq + warped * warped
        # Reference view counts once globally.
        is_first = jax.lax.axis_index("view") == 0
        ref_vol = jnp.broadcast_to(ref[None], (d,) + ref.shape)
        sum_f = sum_f + jnp.where(is_first, 1.0, 0.0) * ref_vol
        sum_sq = sum_sq + jnp.where(is_first, 1.0, 0.0) * ref_vol * ref_vol
        sum_f = jax.lax.psum(sum_f, axis_name="view")
        sum_sq = jax.lax.psum(sum_sq, axis_name="view")
        return variance_from_partials(sum_f, sum_sq, num_views)

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("view"), P("view"), P()),
        out_specs=P(),
        check_vma=False,
    )(ref_feat, src_feats, rel_projs, depth_values)


def psum_metrics(metrics: dict, axis_name: str = "data") -> dict:
    """Mean-reduce a dict of scalar metrics across an axis (the reference's
    dist.reduce to rank 0, CasMVSNet/utils.py:183-201 — except every shard
    gets the result)."""
    n = jax.lax.psum(1, axis_name)
    return {k: jax.lax.psum(v, axis_name) / n for k, v in metrics.items()}
