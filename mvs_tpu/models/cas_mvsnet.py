"""CasMVSNet: 3-stage cascade of narrowing plane sweeps.

Reference behavior: CasMVSNet/models/cas_mvsnet.py:69-165 — FPN features
{32ch@1/4, 16ch@1/2, 8ch@1/1}; stage 1 sweeps the global range with 48
hypotheses at 1/4 res, stages 2/3 sweep per-pixel windows (±D/2 · ratio ·
base_interval, ratios 4/2/1) centred on the upsampled previous depth; each
stage runs the full variance-volume + 3D-U-Net + soft-argmin pass.

Design deltas from the reference (documented, numerically equivalent):
  * hypothesis windows are built directly at stage resolution from the
    bilinearly-upsampled previous depth, instead of building at full res and
    trilinearly resizing down (bilinear∘bilinear == bilinear).
  * projections arrive as packed 4x4 K@E per stage rather than separate
    (extrinsic, intrinsic) pairs composed in the forward pass.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvs_tpu.geometry.depth import cascade_depth_samples
from mvs_tpu.nn.cost_reg import UNetCostRegNet
from mvs_tpu.nn.feature_nets import CascadeFeatureNet
from mvs_tpu.ops.cost_volume import (
    variance_cost_volume,
)
from mvs_tpu.ops.regression import regress_depth_and_confidence

__all__ = ["CasMVSNet"]


class CasMVSNet(nn.Module):
    base_channels: int = 8
    ndepths: Sequence[int] = (48, 32, 8)
    depth_interval_ratios: Sequence[float] = (4.0, 2.0, 1.0)
    arch_mode: str = "fpn"
    share_cr: bool = False  # share one regularizer across stages
    grad_method: str = "detach"
    normalization: str = "batch"
    axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32
    # 'gather' (exact) | 'hat' (TPU fast path: dense two-pass for the global
    # stage-1 sweep, banded tiles for the narrow per-pixel refine stages).
    sampler: str = "gather"
    # Banded-warp coverage budget overrides (tile_rows/tile_cols/band_h/
    # band_w/depth_group) for wide-baseline data; None = ops.hat_warp
    # defaults (64-px disparity budget). Plumbed from ModelConfig.
    band_cfg: Any = None
    # Optional sharding-constraint hook for each stage's (B, D, H, W, C)
    # cost volume (see parallel.ShardingPlan).
    volume_constraint: Any = None
    # Optional view-sharded volume builder (parallel.collectives.
    # make_view_variance): builds each stage's variance volume under
    # shard_map with the source-view axis on the mesh 'view' axis and ONE
    # explicit psum('view') completing the Σf/Σf² moments (the reference's
    # only analogue is NCCL DDP over the batch, CasMVSNet/train.py:297-302).
    # Explicit, not a GSPMD constraint: the partitioner derives exactly-2x
    # KERNEL gradients for every downstream conv from a view-sharded stack
    # combined with depth/space volume sharding (tests/test_mesh16.py).
    view_variance: Any = None

    @nn.compact
    def __call__(self, imgs, proj_matrices, depth_values, train: bool = False):
        """imgs (B,V,H,W,3); proj_matrices {'stageK': (B,V,4,4)} at stage res;
        depth_values (B, D_total) global ladder (defines range + base interval)."""
        b, v, h, w, _ = imgs.shape
        num_stages = len(self.ndepths)

        depth_interval = (depth_values[:, -1] - depth_values[:, 0]) / depth_values.shape[1]

        feats = CascadeFeatureNet(
            self.base_channels, num_stages, self.arch_mode,
            self.normalization, self.axis_name, dtype=self.compute_dtype,
        )(imgs.reshape(b * v, h, w, 3).astype(self.compute_dtype), train)
        # Un-flatten each stage back to (B, V, h_s, w_s, c_s).
        feats = {
            k: f.reshape(b, v, *f.shape[1:]) for k, f in feats.items()
        }

        if self.share_cr:
            # The reference's share_cr constructor is broken/unused
            # (CasMVSNet/models/cas_mvsnet.py:100 passes a channel *list*);
            # we implement the intent: per-stage 1x1x1 projection to a common
            # width feeding one shared regularizer.
            shared_reg = UNetCostRegNet(
                self.base_channels, self.normalization, self.axis_name,
                dtype=self.compute_dtype, name="cost_reg_shared",
            )

        outputs = {}
        depth = None
        for stage_idx in range(num_stages):
            stage = f"stage{stage_idx + 1}"
            stage_feats = feats[stage]
            _, _, sh, sw, _ = stage_feats.shape
            proj = proj_matrices[stage]
            rel_projs = jnp.einsum(
                "bvij,bjk->bvik", proj[:, 1:], jnp.linalg.inv(proj[:, 0])
            )

            if depth is None:
                cur_depth = depth_values  # (B, D) global ladder
            else:
                if self.grad_method == "detach":
                    depth = jax.lax.stop_gradient(depth)
                cur_depth = jax.image.resize(depth, (b, sh, sw), method="bilinear")

            interval = self.depth_interval_ratios[stage_idx] * depth_interval  # (B,)
            hyp = jax.vmap(
                lambda cd, iv: cascade_depth_samples(
                    cd, self.ndepths[stage_idx], iv, sh, sw
                )
            )(cur_depth, interval)  # (B, D_s, sh, sw)

            sampler = self.sampler
            if sampler == "hat" and stage_idx > 0:
                # Refine stages sweep narrow per-pixel windows at high
                # resolution: each output tile's samples live in a small
                # source window, so the banded tiled warp cuts the hat
                # matmuls' contraction size by ~HW/(band_h*band_w).
                sampler = "hat_banded"
            if self.view_variance is not None:
                # View-sharded path: each 'view' shard warps its local
                # source views (per-view 'gather'/'hat' samplers — the
                # banded sampler is a fused all-view variance with no
                # per-view form) and one explicit psum completes the
                # moments (shard_map, collectives.make_view_variance).
                volume = self.view_variance(
                    stage_feats[:, 0], stage_feats[:, 1:], rel_projs, hyp)
            else:
                def build_volume(rf, sf, rp, hh, _sampler=sampler):
                    return variance_cost_volume(
                        rf, sf, rp, hh, sampler=_sampler,
                        band_cfg=self.band_cfg)

                if train:
                    # Rematerialize the warp in the backward pass: storing
                    # its per-tile hat weights / warped intermediates for AD
                    # costs tens of GB at reference train shapes (measured
                    # 69.8 GB at 640x512 b=4 without remat vs the v5e's
                    # 16 GB); recomputing them trades ~1/3 more warp FLOPs
                    # for fitting the reference training envelope.
                    build_volume = jax.checkpoint(build_volume)
                volume = jax.vmap(build_volume)(
                    stage_feats[:, 0], stage_feats[:, 1:], rel_projs, hyp)
            if self.volume_constraint is not None:
                volume = self.volume_constraint(volume)

            if self.share_cr:
                volume = nn.Conv(
                    self.base_channels * 4, (1, 1, 1), use_bias=False,
                    dtype=self.compute_dtype, name=f"cr_inproj_{stage}",
                )(volume)
                score = shared_reg(volume, train)
            else:
                score = UNetCostRegNet(
                    self.base_channels, self.normalization, self.axis_name,
                    dtype=self.compute_dtype, name=f"cost_reg_{stage}",
                )(volume, train)

            depth, conf, prob = jax.vmap(regress_depth_and_confidence)(
                score.astype(jnp.float32), hyp
            )
            outputs[stage] = {
                "depth": depth,
                "photometric_confidence": conf,
                "prob_volume": prob,
            }

        outputs["depth"] = depth
        outputs["photometric_confidence"] = outputs[f"stage{num_stages}"][
            "photometric_confidence"
        ]
        return outputs
