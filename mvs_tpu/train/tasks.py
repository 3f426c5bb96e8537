"""Task adapters: one uniform (params, batch_stats, batch) -> (loss, aux)
interface per model family, consumed by train.state.make_train_step.

Each task pins the batch dict layout its dataset produces and the loss/metric
definitions of the corresponding reference pipeline (SURVEY.md §2.2)."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mvs_tpu.train.losses import (
    cascade_loss, masked_smooth_l1, ohem_smooth_l1, point_mvsnet_loss,
    pyramid_loss,
)
from mvs_tpu.train.metrics import interval_metrics, standard_metrics

__all__ = ["MVSNetTask", "CascadeTask", "PyramidTask", "PointTask"]


@dataclasses.dataclass
class _TaskBase:
    model: nn.Module

    def _apply(self, params, batch_stats, train, *args, **kwargs):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            out, updates = self.model.apply(
                variables, *args, train=True, mutable=["batch_stats"], **kwargs
            )
            return out, updates["batch_stats"]
        return self.model.apply(variables, *args, train=False, **kwargs), batch_stats

    def loss_and_metrics(self, params, batch_stats, batch, train: bool = True):
        raise NotImplementedError

    def __call__(self, params, batch_stats, batch):
        return self.loss_and_metrics(params, batch_stats, batch, train=True)


@dataclasses.dataclass
class MVSNetTask(_TaskBase):
    """batch: imgs (B,V,H,W,3), proj_matrices (B,V,4,4), depth_values (B,D),
    depth_gt (B,h,w), mask (B,h,w).

    loss_name: 'smooth_l1' (reference MVSNet/models/mvsnet.py:201-203) or
    'ohem' — hard-example-mined smooth-L1 over the hardest ohem_topk fraction
    of valid pixels (the MVSNet_pl pipeline's loss, MVSNet_pl/losses.py:4-19).
    """

    loss_name: str = "smooth_l1"
    ohem_topk: float = 0.6

    def forward(self, params, batch_stats, batch, train=False):
        """Model outputs (out_dict, new_batch_stats) for this task's batch."""
        return self._apply(
            params, batch_stats, train,
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        )

    def loss_and_metrics(self, params, batch_stats, batch, train=True):
        out, new_stats = self.forward(params, batch_stats, batch, train)
        depth_key = "refined_depth" if "refined_depth" in out else "depth"
        if self.loss_name == "ohem":
            loss = ohem_smooth_l1(out[depth_key], batch["depth_gt"],
                                  batch["mask"], topk_frac=self.ohem_topk)
        elif self.loss_name == "smooth_l1":
            loss = masked_smooth_l1(out[depth_key], batch["depth_gt"],
                                    batch["mask"])
        else:
            raise ValueError(f"unknown loss {self.loss_name!r}")
        metrics = standard_metrics(out["depth"], batch["depth_gt"], batch["mask"])
        return loss, (new_stats, metrics)


@dataclasses.dataclass
class CascadeTask(_TaskBase):
    """batch: imgs, proj_matrices {stageK: (B,V,4,4)}, depth_values (B,D),
    depth_gt {stageK}, mask {stageK}."""

    stage_weights: Any = (0.5, 1.0, 2.0)

    def forward(self, params, batch_stats, batch, train=False):
        """Model outputs (out_dict, new_batch_stats) for this task's batch."""
        return self._apply(
            params, batch_stats, train,
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        )

    def loss_and_metrics(self, params, batch_stats, batch, train=True):
        out, new_stats = self.forward(params, batch_stats, batch, train)
        loss, last = cascade_loss(
            out, batch["depth_gt"], batch["mask"], self.stage_weights
        )
        last_stage = f"stage{len(self.stage_weights)}"
        metrics = standard_metrics(
            out["depth"], batch["depth_gt"][last_stage], batch["mask"][last_stage]
        )
        metrics["last_stage_loss"] = last
        return loss, (new_stats, metrics)


@dataclasses.dataclass
class PyramidTask(_TaskBase):
    """CVP/AACVP. batch: imgs, intrinsics (B,V,3,3), extrinsics (B,V,4,4),
    depth_min (B,), depth_max (B,), depth_gt_levels [finest..], mask_levels."""

    def forward(self, params, batch_stats, batch, train=False):
        """Model outputs (out_dict, new_batch_stats) for this task's batch."""
        return self._apply(
            params, batch_stats, train,
            batch["imgs"], batch["intrinsics"], batch["extrinsics"],
            batch["depth_min"], batch["depth_max"],
        )

    def loss_and_metrics(self, params, batch_stats, batch, train=True):
        out, new_stats = self.forward(params, batch_stats, batch, train)
        n = len(out["depth_levels"])
        loss = pyramid_loss(
            out["depth_levels"], batch["depth_gt_levels"][:n], batch["mask_levels"][:n]
        )
        metrics = standard_metrics(
            out["depth"], batch["depth_gt_levels"][0], batch["mask_levels"][0]
        )
        return loss, (new_stats, metrics)


@dataclasses.dataclass
class PointTask(_TaskBase):
    """Point-MVSNet. batch: imgs, intrinsics, extrinsics, depth_start (B,),
    depth_interval (B,), depth_gt (B,H,W full res, 0=invalid)."""

    num_depth: int = 48
    use_flow: bool = True

    def forward(self, params, batch_stats, batch, train=False):
        """Model outputs (out_dict, new_batch_stats) for this task's batch."""
        return self._apply(
            params, batch_stats, train,
            batch["imgs"], batch["intrinsics"], batch["extrinsics"],
            batch["depth_start"], batch["depth_interval"],
            num_depth=self.num_depth, use_flow=self.use_flow,
            xyz_mean=batch.get("xyz_mean"), xyz_std=batch.get("xyz_std"),
        )

    def loss_and_metrics(self, params, batch_stats, batch, train=True):
        out, new_stats = self.forward(params, batch_stats, batch, train)
        loss, parts = point_mvsnet_loss(
            out, batch["depth_gt"], batch["depth_interval"]
        )
        import jax

        b, h, w = out["depth"].shape
        gt = jax.image.resize(batch["depth_gt"], (b, h, w), method="nearest")
        mask = (gt > 0).astype(jnp.float32)
        metrics = standard_metrics(out["depth"], gt, mask)
        # The reference's <1x/<3x interval accuracies per prediction stage
        # (PointMVSNet/pointmvsnet/model.py:342-420).
        metrics.update(interval_metrics(out["depth"], gt, mask,
                                        batch["depth_interval"]))
        cb, ch, cw = out["coarse_depth"].shape
        cgt = jax.image.resize(batch["depth_gt"], (cb, ch, cw), method="nearest")
        metrics.update(interval_metrics(
            out["coarse_depth"], cgt, (cgt > 0).astype(jnp.float32),
            batch["depth_interval"], prefix="coarse_",
        ))
        metrics.update({k: v for k, v in parts.items()})
        return loss, (new_stats, metrics)
