"""CVP-MVSNet / AACVP-MVSNet: cost-volume pyramid, coarse-to-fine.

Reference behavior: CVP-MVSNet/models/net.py:91-209 — an image pyramid (×0.5
per level) feeds a *shared-weight* stride-1 feature extractor; the coarsest
level sweeps `coarse_depths` uniform hypotheses over [depth_min, depth_max];
each finer level upsamples the previous depth ×2 (bicubic) and sweeps
2·num_offsets residual hypotheses around it, with the hypothesis spacing
either a fixed training interval (reference hardcodes 6.8085 mm for DTU,
modules.py:134-143) or the test-time epipolar 1-pixel interval
(modules.py:146-219, which reduces to a scalar mean — see
mvs_tpu.geometry.depth.epipolar_depth_interval).

AACVP-MVSNet (AACVP-MVSNet/models/AACVPMVSNet.py:30-194) is the same skeleton
with (a) a self-attention final feature layer and (b) group-wise correlation
instead of variance — both toggled here via `attention` / `cost_mode`.

One PyramidCostRegNet instance is shared across every level (reference
net.py:52-89).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvs_tpu.geometry.depth import (
    epipolar_depth_interval, residual_depth_hypotheses, uniform_depth_values,
)
from mvs_tpu.geometry.projection import compose_projection, scale_intrinsics
from mvs_tpu.nn.cost_reg import PyramidCostRegNet
from mvs_tpu.nn.feature_nets import PyramidFeatureNet
from mvs_tpu.ops.cost_volume import (
    group_correlation_cost_volume, variance_cost_volume,
)
from mvs_tpu.ops.regression import regress_depth_and_confidence

__all__ = ["CVPMVSNet"]


class CVPMVSNet(nn.Module):
    num_levels: int = 2
    coarse_depths: int = 48
    num_offsets: int = 4  # refinement sweeps 2*num_offsets hypotheses
    train_interval: float = 6.8085  # reference's hardcoded DTU spacing (mm)
    feature_channels: int = 16
    cost_mode: str = "variance"  # 'variance' (CVP) | 'group_correlation' (AACVP)
    num_groups: int = 4  # group-correlation groups
    attention: bool = False  # AACVP self-attention feature tail
    num_heads: int = 1
    use_epipolar_interval: bool = False  # test-time per-scene interval
    sampler: str = "gather"  # 'gather' (exact) | 'hat' (TPU fast path)
    # Banded-warp coverage budget overrides (see ops.hat_warp); None = defaults.
    band_cfg: dict | None = None
    reg_base_channels: int = 16
    normalization: str = "batch"
    axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32

    def _cost_volume(self, ref_feat, src_feats, rel_projs, hyp):
        if self.cost_mode == "variance":
            sampler = self.sampler
            if sampler == "hat" and hyp.ndim == 3:
                # Per-pixel residual windows at refine levels: banded tiles
                # contract only each tile's source window (see ops.hat_warp).
                sampler = "hat_banded"
            return variance_cost_volume(ref_feat, src_feats, rel_projs, hyp,
                                        sampler=sampler, band_cfg=self.band_cfg)
        if self.cost_mode == "group_correlation":
            sampler = self.sampler
            if sampler == "hat" and hyp.ndim == 3:
                # Same banded-tile speedup as the variance path at per-pixel
                # refine levels (closes the AACVP eval-shape gap).
                sampler = "hat_banded"
            return group_correlation_cost_volume(
                ref_feat, src_feats, rel_projs, hyp, self.num_groups,
                sampler=sampler, band_cfg=self.band_cfg,
            )
        raise ValueError(f"unknown cost_mode {self.cost_mode!r}")

    @nn.compact
    def __call__(self, imgs, intrinsics, extrinsics, depth_min, depth_max,
                 train: bool = False):
        """imgs (B,V,H,W,3) view 0 = ref; intrinsics (B,V,3,3) at full image
        res; extrinsics (B,V,4,4); depth_min/max (B,)."""
        b, v, h, w, _ = imgs.shape

        feature_net = PyramidFeatureNet(
            self.feature_channels, self.attention, self.num_heads,
            self.normalization, self.axis_name, dtype=self.compute_dtype,
        )
        cost_reg = PyramidCostRegNet(
            self.reg_base_channels, self.normalization, self.axis_name,
            dtype=self.compute_dtype,
        )

        # Image pyramid, full res first; shared feature extractor per level.
        pyramid_feats = []  # level i: (B, V, h_i, w_i, C)
        level_imgs = imgs.astype(self.compute_dtype)
        for level in range(self.num_levels):
            lh, lw = level_imgs.shape[2], level_imgs.shape[3]
            f = feature_net(level_imgs.reshape(b * v, lh, lw, 3), train)
            pyramid_feats.append(f.reshape(b, v, lh, lw, -1))
            if level + 1 < self.num_levels:
                level_imgs = jax.image.resize(
                    level_imgs, (b, v, lh // 2, lw // 2, 3), method="bilinear"
                )

        def level_rel_projs(level_scale):
            k = scale_intrinsics(intrinsics, level_scale)
            proj = compose_projection(k, extrinsics)  # (B, V, 4, 4)
            return jnp.einsum(
                "bvij,bjk->bvik", proj[:, 1:], jnp.linalg.inv(proj[:, 0])
            )

        # Coarse sweep at the smallest level.
        coarse_feats = pyramid_feats[-1]
        ch, cw = coarse_feats.shape[2], coarse_feats.shape[3]
        scale = 0.5 ** (self.num_levels - 1)
        rels = level_rel_projs(scale)
        interval = (depth_max - depth_min) / (self.coarse_depths - 1)  # (B,)
        hyp = jax.vmap(
            lambda dmin, iv: uniform_depth_values(dmin, iv, self.coarse_depths)
        )(depth_min, interval)  # (B, D)

        volume = jax.vmap(self._cost_volume)(
            coarse_feats[:, 0], coarse_feats[:, 1:], rels, hyp
        )
        score = cost_reg(volume, train)
        depth, conf, _ = jax.vmap(regress_depth_and_confidence)(
            score.astype(jnp.float32), hyp
        )

        depth_levels = [depth]  # coarsest first; reversed at the end
        # Coarse-to-fine refinement.
        for level in range(self.num_levels - 2, -1, -1):
            feats = pyramid_feats[level]
            lh, lw = feats.shape[2], feats.shape[3]
            scale = 0.5**level
            rels = level_rel_projs(scale)

            depth_up = jax.image.resize(depth, (b, lh, lw), method="cubic")
            depth_up = jax.lax.stop_gradient(depth_up) if not train else depth_up

            if self.use_epipolar_interval:
                k_level = scale_intrinsics(intrinsics, scale)
                interval = jax.vmap(
                    lambda d, kr, er, ks, es: epipolar_depth_interval(
                        d, kr, er, ks, es
                    )
                )(
                    jax.lax.stop_gradient(depth_up),
                    k_level[:, 0], extrinsics[:, 0],
                    k_level[:, 1], extrinsics[:, 1],
                )  # (B,)
            else:
                interval = jnp.full((b,), self.train_interval, depth.dtype)

            hyp = jax.vmap(
                lambda d, iv: residual_depth_hypotheses(d, iv, self.num_offsets)
            )(depth_up, interval)  # (B, 2n, lh, lw)

            volume = jax.vmap(self._cost_volume)(
                feats[:, 0], feats[:, 1:], rels, hyp
            )
            score = cost_reg(volume, train)
            depth, conf, _ = jax.vmap(regress_depth_and_confidence)(
                score.astype(jnp.float32), hyp
            )
            depth_levels.append(depth)

        return {
            "depth": depth,
            "photometric_confidence": conf,
            # Finest-first list for the pyramid loss.
            "depth_levels": depth_levels[::-1],
        }
