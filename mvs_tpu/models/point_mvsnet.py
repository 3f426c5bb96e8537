"""Point-MVSNet: coarse low-res cost volume + iterative PointFlow refinement.

Reference behavior: PointMVSNet/pointmvsnet/model.py:45-305 —
  * coarse stage: a 1/8-res variance cost volume built by unprojecting the ref
    frustum lattice to world points and fetching every view's features at
    their projections; VolumeConv regularizes; softmax(-cost) + soft-argmin.
  * PointFlow: for each refinement iteration, hypothesis points at offsets
    {-2,-1,0,1,2}·interval around the current depth; multi-scale variance
    features (ImageConv conv1-3) + normalized xyz (×8) per point; EdgeConv
    stack over a lattice kNN graph; a SharedMLP head scores the 5 offsets and
    the expected offset updates the depth.

Conventions: intrinsics are at full input-image resolution; feature-level
intrinsics are derived by scaling (feature stride 8 for the coarse volume,
`scale` for each flow iteration).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvs_tpu.geometry.projection import invert_rigid, scale_intrinsics
from mvs_tpu.nn.point_nets import EdgeConv, ImageConv, SharedMLP, VolumeConv
from mvs_tpu.ops.point_ops import (
    fetch_point_features, lattice_knn, point_pixel_grid,
)

__all__ = ["PointMVSNet"]

_OFFSETS = (-2.0, -1.0, 0.0, 1.0, 2.0)


def _unproject_ref_lattice(k_inv, extr_inv, depths, height, width):
    """Ref-frustum world points: depths (D, N) or (N,) -> (3, D*N) / (3, N)."""
    uv = k_inv @ point_pixel_grid(height, width)  # (3, N)
    if depths.ndim == 1:
        cam = uv * depths[None]
    else:
        cam = uv[:, None, :] * depths[None]  # (3, D, N)
        cam = cam.reshape(3, -1)
    cam_h = jnp.concatenate([cam, jnp.ones_like(cam[:1])], axis=0)
    return (extr_inv @ cam_h)[:3]


class PointMVSNet(nn.Module):
    img_base_channels: int = 8
    vol_base_channels: int = 8
    flow_channels: Sequence[int] = (64, 64, 16, 1)
    k: int = 16
    flow_scales: Sequence[float] = (0.25, 0.5)  # flow res relative to input image
    inter_scales: Sequence[float] = (0.75, 0.375)  # hypothesis interval factors
    coarse_stride: int = 8
    # Test-time tiled sub-flow (reference PointMVSNet/pointmvsnet/
    # model.py:231-267): at eval, split each flow lattice into
    # flow_sub_stride^2 interleaved sub-grids and run the PointFlow body on
    # each, scattering the depth residuals back. Peak memory of the kNN
    # feature gather drops by stride^2 (the full-res gather is
    # (5N, k=16, C~136) floats — infeasible at DTU eval sizes untiled).
    # 1 = off; ignored in training (the reference also tiles only at test).
    flow_sub_stride: int = 1
    normalization: str = "batch"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, imgs, intrinsics, extrinsics, depth_start, depth_interval,
                 num_depth: int, xyz_mean=None, xyz_std=None,
                 use_flow: bool = True, train: bool = False):
        """imgs (B,V,H,W,3); intrinsics (B,V,3,3) at image res; extrinsics
        (B,V,4,4); depth_start/interval (B,); num_depth static."""
        b, v, h, w, _ = imgs.shape
        kw = dict(normalization=self.normalization, axis_name=self.axis_name)
        if xyz_mean is None:
            xyz_mean = jnp.zeros((b, 3))
        if xyz_std is None:
            xyz_std = jnp.ones((b, 3))

        extr_inv = jax.vmap(jax.vmap(invert_rigid))(extrinsics)  # (B, V, 4, 4)

        # ---------------- coarse stage ----------------
        coarse_tower = ImageConv(self.img_base_channels, **kw, name="coarse_img_conv")
        feats = coarse_tower(imgs.reshape(b * v, h, w, 3), train)["conv3"]
        fh, fw, fc = feats.shape[1:]
        feats = feats.reshape(b, v, fh, fw, fc)
        k_feat = scale_intrinsics(intrinsics, 1.0 / self.coarse_stride)

        depth_ladder = depth_start[:, None] + depth_interval[:, None] * jnp.arange(
            num_depth, dtype=jnp.float32
        )  # (B, D)

        def coarse_volume(feats_b, k_b, extr_b, extr_inv_b, depths_b):
            n = fh * fw
            world = _unproject_ref_lattice(
                jnp.linalg.inv(k_b[0]), extr_inv_b[0],
                jnp.broadcast_to(depths_b[:, None], (num_depth, n)), fh, fw,
            )  # (3, D*N)
            pf = fetch_point_features(feats_b, world, k_b, extr_b)  # (V, D*N, C)
            # Ref view: use its own features directly (no resampling error).
            ref_direct = jnp.broadcast_to(
                feats_b[0].reshape(1, n, fc), (num_depth, n, fc)
            ).reshape(num_depth * n, fc)
            pf = pf.at[0].set(ref_direct)
            mean = jnp.mean(pf, axis=0)
            var = jnp.mean(pf * pf, axis=0) - mean * mean  # (D*N, C)
            return var.reshape(num_depth, fh, fw, fc), world

        volume, world_points = jax.vmap(coarse_volume)(
            feats, k_feat, extrinsics, extr_inv, depth_ladder
        )
        score = VolumeConv(self.vol_base_channels, **kw, name="coarse_vol_conv")(
            volume, train
        )
        prob = jax.nn.softmax(-score.astype(jnp.float32), axis=1)  # (B, D, fh, fw)
        depth = jnp.sum(prob * depth_ladder[:, :, None, None], axis=1)  # (B, fh, fw)

        # 2-tap probability map at the regressed hypothesis index. Gather-free
        # (see ops.regression.photometric_confidence): sum under equality
        # masks rather than take_along_axis, which serializes on TPU.
        idx = (depth - depth_start[:, None, None]) / depth_interval[:, None, None]
        lo = jnp.clip(jnp.floor(idx), 0, num_depth - 1).astype(jnp.int32)
        hi = jnp.clip(jnp.ceil(idx), 0, num_depth - 1).astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 1)
        prob_map = jnp.sum(
            prob * ((iota == lo[:, None]).astype(prob.dtype)
                    + (iota == hi[:, None]).astype(prob.dtype)),
            axis=1,
        )

        preds = {
            "coarse_depth": depth,
            "coarse_prob_map": prob_map,
            "world_points": world_points,
        }

        # Flow modules are constructed unconditionally so the parameter tree
        # is identical whether or not the flow runs. The reference trains the
        # coarse network for INIT_EPOCHs and then enables PointFlow on the
        # *same* weights (PointMVSNet/pointmvsnet/train.py:218 — torch modules
        # own all params regardless of isFlow); a coarse-only init must
        # therefore still create the flow branch's params.
        flow_tower = ImageConv(self.img_base_channels, **kw, name="flow_img_conv")
        chosen = ("conv1", "conv2", "conv3")
        edge_convs = [
            EdgeConv(32, concat_central=False, **kw, name="edge_conv0"),
            EdgeConv(32, concat_central=True, **kw, name="edge_conv1"),
            EdgeConv(64, concat_central=True, **kw, name="edge_conv2"),
        ]
        flow_mlp = SharedMLP(self.flow_channels[:-1], **kw, name="flow_mlp")
        flow_head = nn.Dense(self.flow_channels[-1], use_bias=False, name="flow_head")

        offsets = jnp.asarray(_OFFSETS, dtype=jnp.float32)
        num_off = len(_OFFSETS)

        if not use_flow:
            if self.is_initializing():
                # Touch every flow module with shape-minimal dummies so their
                # params exist (param shapes depend only on channel counts).
                # Flax skips running-stat updates while initializing, so this
                # has no numeric side effects.
                pyr = flow_tower(jnp.zeros((1, 16, 16, 3), imgs.dtype), False)
                c_feat = sum(pyr[c].shape[-1] for c in chosen) + 24
                n_pts = num_off * 4
                x = jnp.zeros((1, n_pts, c_feat), jnp.float32)
                dummy_idx = jnp.zeros((1, n_pts, self.k), jnp.int32)
                outs = []
                for ec in edge_convs:
                    x = ec(x, dummy_idx, False)
                    outs.append(x)
                flow_head(flow_mlp(jnp.concatenate(outs, axis=-1), False))
            preds["depth"] = depth
            return preds

        # ---------------- PointFlow refinement ----------------
        pyramid = flow_tower(imgs.reshape(b * v, h, w, 3), train)
        if not train:
            pyramid = {c: jax.lax.stop_gradient(pyramid[c]) for c in chosen}

        for it, (scale, inter_scale) in enumerate(
            zip(self.flow_scales, self.inter_scales)
        ):
            sh, sw = int(h * scale), int(w * scale)
            interval = inter_scale * depth_interval  # (B,)
            k_flow = scale_intrinsics(intrinsics, scale)
            # Resize pyramid levels to flow res once per iteration.
            level_feats = [
                jax.image.resize(
                    pyramid[c],
                    (b * v, sh, sw, pyramid[c].shape[-1]),
                    method="bilinear",
                ).reshape(b, v, sh, sw, -1)
                for c in chosen
            ]
            depth_flow = jax.image.resize(depth, (b, sh, sw), method="nearest")
            if not train:
                depth_flow = jax.lax.stop_gradient(depth_flow)

            def run_flow(depth_grid, affine, gh, gw):
                """Flow body on one pixel lattice: depth_grid (B, gh, gw);
                `affine` (3,3) maps the lattice's 0.5-centred pixel coords to
                full flow-res pixel coords (identity when untiled). Returns
                (delta (B, gh, gw), flow_prob (B, num_off, gh, gw))."""
                n = gh * gw

                def flow_features(depth_b, k_b, extr_b, extr_inv_b,
                                  feats_levels_b, interval_b, mean_b, std_b):
                    k_inv = jnp.linalg.inv(k_b[0]) @ affine
                    per_offset_feats = []
                    per_offset_xyz = []
                    for o in range(num_off):
                        d_o = depth_b.reshape(-1) + offsets[o] * interval_b
                        world = _unproject_ref_lattice(
                            k_inv, extr_inv_b[0], d_o, gh, gw
                        )  # (3, N)
                        parts = []
                        for lf in feats_levels_b:
                            pf = fetch_point_features(lf, world, k_b, extr_b)
                            m = jnp.mean(pf, axis=0)
                            parts.append(jnp.mean(pf * pf, axis=0) - m * m)
                        xyz_n = (world - mean_b[:, None]) / std_b[:, None]
                        parts.append(jnp.tile(xyz_n.T, (1, 8)))  # (N, 24)
                        per_offset_feats.append(jnp.concatenate(parts, axis=-1))
                        per_offset_xyz.append(xyz_n)
                    feats_all = jnp.stack(per_offset_feats, axis=0)
                    xyz_all = jnp.stack(per_offset_xyz, axis=1)
                    return (
                        feats_all.reshape(num_off * n, -1),
                        xyz_all.reshape(3, num_off, gh, gw),
                    )

                feat_pts, xyz = jax.vmap(flow_features)(
                    depth_grid, k_flow, extrinsics, extr_inv, level_feats,
                    interval, xyz_mean, xyz_std,
                )  # (B, num_off*N, C), (B, 3, num_off, gh, gw)

                nn_idx = jax.vmap(
                    lambda x: lattice_knn(x, kernel_size=num_off, k=self.k)
                )(xyz)  # (B, num_off*N, k)

                edge_outs = []
                x = feat_pts
                for ec in edge_convs:
                    x = ec(x, nn_idx, train)
                    edge_outs.append(x)
                edge_cat = jnp.concatenate(edge_outs, axis=-1)
                flow = flow_head(flow_mlp(edge_cat, train))  # (B, num_off*N, 1)
                flow = flow.reshape(b, num_off, gh, gw)
                flow_prob = jax.nn.softmax(-flow.astype(jnp.float32), axis=1)
                delta = jnp.sum(
                    flow_prob
                    * (offsets[None, :, None, None]
                       * interval[:, None, None, None]),
                    axis=1,
                )
                return delta, flow_prob

            s = self.flow_sub_stride if not train else 1
            if s > 1 and sh % s == 0 and sw % s == 0:
                # Tiled sub-flow: s^2 interleaved sub-lattices (reference
                # model.py:231-267). Sub pixel centre u maps to full coord
                # s*u + (off + 0.5 - 0.5*s) in 0.5-centred convention.
                delta = jnp.zeros_like(depth_flow)
                flow_prob = jnp.zeros((b, num_off, sh, sw), jnp.float32)
                for iy in range(s):
                    for ix in range(s):
                        affine = jnp.asarray(
                            [[s, 0.0, ix + 0.5 - 0.5 * s],
                             [0.0, s, iy + 0.5 - 0.5 * s],
                             [0.0, 0.0, 1.0]], jnp.float32)
                        d_sub, p_sub = run_flow(
                            depth_flow[:, iy::s, ix::s], affine,
                            sh // s, sw // s)
                        delta = delta.at[:, iy::s, ix::s].set(d_sub)
                        flow_prob = flow_prob.at[:, :, iy::s, ix::s].set(p_sub)
            else:
                delta, flow_prob = run_flow(depth_flow, jnp.eye(3), sh, sw)
            depth = depth_flow + delta
            preds[f"flow{it + 1}"] = depth
            preds[f"flow{it + 1}_prob"] = flow_prob

        preds["depth"] = depth
        return preds
