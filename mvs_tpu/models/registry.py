"""Model + task factory from config."""

from __future__ import annotations

from mvs_tpu.models.cas_mvsnet import CasMVSNet
from mvs_tpu.models.cvp_mvsnet import CVPMVSNet
from mvs_tpu.models.mvsnet import MVSNet
from mvs_tpu.models.point_mvsnet import PointMVSNet
from mvs_tpu.train.tasks import CascadeTask, MVSNetTask, PointTask, PyramidTask

__all__ = ["build_model_and_task", "MODEL_NAMES"]

MODEL_NAMES = ("mvsnet", "cas_mvsnet", "cvp_mvsnet", "aacvp_mvsnet", "point_mvsnet")


def _band_cfg(m):
    """Non-zero ModelConfig band overrides -> fused_variance_volume_banded
    kwargs (None = all defaults)."""
    cfg = {
        "tile_rows": m.band_tile_rows, "tile_cols": m.band_tile_cols,
        "band_h": m.band_h, "band_w": m.band_w,
        "depth_group": m.band_depth_group,
    }
    cfg = {k: v for k, v in cfg.items() if v}
    return cfg or None


def build_model_and_task(cfg, volume_constraint=None, view_variance=None):
    """cfg: utils.config.Config. Returns (model, task, collate_fn_name)."""
    import jax.numpy as jnp

    m = cfg.model
    dtype = jnp.dtype(m.compute_dtype)
    if m.name == "mvsnet":
        model = MVSNet(
            base_channels=m.base_channels, refine=m.refine,
            normalization=m.normalization, sampler=m.sampler,
            compute_dtype=dtype, volume_constraint=volume_constraint,
            view_variance=view_variance,
        )
        return model, MVSNetTask(model, loss_name=cfg.train.loss,
                                 ohem_topk=cfg.train.ohem_topk), "collate_mvsnet"
    if m.name == "cas_mvsnet":
        model = CasMVSNet(
            base_channels=m.base_channels, ndepths=tuple(m.ndepths),
            depth_interval_ratios=tuple(m.depth_interval_ratios),
            arch_mode=m.arch_mode, share_cr=m.share_cr,
            normalization=m.normalization, sampler=m.sampler,
            compute_dtype=dtype, volume_constraint=volume_constraint,
            view_variance=view_variance,
            band_cfg=_band_cfg(m),
        )
        return model, CascadeTask(model), "collate_cascade"
    if m.name in ("cvp_mvsnet", "aacvp_mvsnet"):
        aacvp = m.name == "aacvp_mvsnet"
        model = CVPMVSNet(
            num_levels=m.num_levels, coarse_depths=m.coarse_depths,
            num_offsets=m.num_offsets,
            cost_mode="group_correlation" if aacvp else m.cost_mode,
            num_groups=m.num_groups, attention=aacvp or m.attention,
            num_heads=m.num_heads, normalization=m.normalization,
            use_epipolar_interval=m.use_epipolar_interval,
            train_interval=m.train_interval,
            sampler=m.sampler, compute_dtype=dtype, band_cfg=_band_cfg(m),
        )
        return model, PyramidTask(model), "collate_pyramid"
    if m.name == "point_mvsnet":
        model = PointMVSNet(
            img_base_channels=m.base_channels,
            flow_scales=tuple(m.flow_scales), inter_scales=tuple(m.inter_scales),
            flow_sub_stride=m.flow_sub_stride,
            normalization=m.normalization,
        )
        return model, PointTask(model, num_depth=m.num_depth_coarse), "collate_point"
    raise ValueError(f"unknown model {m.name!r}; options: {MODEL_NAMES}")
