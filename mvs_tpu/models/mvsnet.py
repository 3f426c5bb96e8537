"""MVSNet: single plane-sweep cost volume + 3D U-Net regularization.

Reference behavior: MVSNet/models/mvsnet.py:124-198 — 32-ch features at 1/4
res, variance cost volume over D depth hypotheses, CostRegNet, softmax over
depth, soft-argmin regression, 4-tap photometric confidence, optional residual
RefineNet (off by default in the reference runner, MVSNet/train.py:93).

Conventions:
  imgs:          (B, V, H, W, 3) view 0 = reference
  proj_matrices: (B, V, 4, 4) packed K@E at *feature* resolution (1/4),
                 like the reference dataset supplies (MVSNet/datasets/dtu_yao.py:101-104)
  depth_values:  (B, D) hypothesis ladder
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvs_tpu.nn.blocks import ConvBlock
from mvs_tpu.nn.cost_reg import UNetCostRegNet
from mvs_tpu.nn.feature_nets import MVSNetFeatureNet
from mvs_tpu.ops.cost_volume import variance_cost_volume
from mvs_tpu.ops.regression import regress_depth_and_confidence

__all__ = ["MVSNet", "RefineNet"]


class RefineNet(nn.Module):
    """Residual depth refinement from (image, initial depth)."""

    normalization: str = "batch"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, img, depth, train: bool = False):
        # img (B, H, W, 3) at full res; depth (B, h, w): resize img to depth res.
        b, h, w = depth.shape
        img_small = jax.image.resize(img, (b, h, w, img.shape[-1]), method="bilinear")
        x = jnp.concatenate([img_small, depth[..., None]], axis=-1)
        kw = dict(normalization=self.normalization, axis_name=self.axis_name)
        x = ConvBlock(32, (3, 3), **kw)(x, train)
        x = ConvBlock(32, (3, 3), **kw)(x, train)
        x = ConvBlock(32, (3, 3), **kw)(x, train)
        residual = ConvBlock(1, (3, 3), **kw)(x, train)
        return depth + residual[..., 0]


class MVSNet(nn.Module):
    base_channels: int = 8
    reg_base_channels: int = 8
    refine: bool = False
    normalization: str = "batch"
    axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32
    sampler: str = "gather"  # 'gather' (exact) | 'hat' (TPU fast path)
    # Optional callable applying a sharding constraint to the (B, D, H, W, C)
    # cost volume — the hook through which parallel.ShardingPlan shards depth
    # slabs / spatial tiles over the mesh (GSPMD handles the conv halos).
    volume_constraint: Any = None
    # Optional view-sharded volume builder (parallel.collectives.
    # make_view_variance): computes the variance volume under shard_map with
    # the source-view axis on the mesh 'view' axis and ONE explicit
    # psum('view') finishing the Σf/Σf² moments. Explicit rather than a
    # GSPMD sharding constraint because the partitioner derives silently
    # 2x-scaled KERNEL gradients for downstream convs from a view-sharded
    # stack (see make_view_variance's docstring; pinned by
    # tests/test_mesh16.py).
    view_variance: Any = None

    @nn.compact
    def __call__(self, imgs, proj_matrices, depth_values, train: bool = False):
        b, v, h, w, _ = imgs.shape

        # 1. Features for all views in one batched pass (keeps the MXU busy
        #    with one big conv instead of V small ones).
        feats = MVSNetFeatureNet(
            self.base_channels, self.normalization, self.axis_name,
            dtype=self.compute_dtype,
        )(imgs.reshape(b * v, h, w, 3).astype(self.compute_dtype), train)
        fh, fw, fc = feats.shape[1:]
        feats = feats.reshape(b, v, fh, fw, fc)

        # 2. Variance cost volume (f32 warp coords; accumulation in compute dtype).
        rel_projs = jnp.einsum(
            "bvij,bjk->bvik", proj_matrices[:, 1:], jnp.linalg.inv(proj_matrices[:, 0])
        )

        if self.view_variance is not None:
            # View-sharded path: each 'view' shard warps its local source
            # views and one explicit psum completes the moments (shard_map,
            # parallel.collectives.make_view_variance).
            volume = self.view_variance(
                feats[:, 0], feats[:, 1:], rel_projs, depth_values)
        else:
            def build_volume(ref_feat, src_feats, rels, depths):
                return variance_cost_volume(ref_feat, src_feats, rels, depths,
                                            sampler=self.sampler)

            if train:
                # Remat the warp for backward (see CasMVSNet: storing warp
                # intermediates for AD blows the training memory envelope).
                build_volume = jax.checkpoint(build_volume)
            volume = jax.vmap(build_volume)(
                feats[:, 0], feats[:, 1:], rel_projs, depth_values
            )  # (B, D, fh, fw, C)
        if self.volume_constraint is not None:
            volume = self.volume_constraint(volume)

        # 3. Regularization -> score volume (B, D, fh, fw).
        score = UNetCostRegNet(
            self.reg_base_channels, self.normalization, self.axis_name,
            dtype=self.compute_dtype,
        )(volume, train)

        # 4. Softmax over depth + soft-argmin + confidence.
        depth, conf, prob = jax.vmap(regress_depth_and_confidence)(
            score.astype(jnp.float32), depth_values
        )

        out = {"depth": depth, "photometric_confidence": conf, "prob_volume": prob}
        if self.refine:
            out["refined_depth"] = RefineNet(self.normalization, self.axis_name)(
                imgs[:, 0].astype(self.compute_dtype), depth, train
            )
        return out
