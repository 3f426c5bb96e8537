from mvs_tpu.train.losses import (
    cascade_loss, masked_mae, masked_smooth_l1, ohem_smooth_l1,
    point_mvsnet_loss, pyramid_loss, smooth_l1,
)
from mvs_tpu.train.metrics import abs_depth_error, standard_metrics, threshold_error_rate
from mvs_tpu.train.schedule import (
    multistep_lr, parse_milestones, warmup_cosine_lr, warmup_multistep_lr,
)
from mvs_tpu.train.state import TrainState, make_eval_step, make_train_step
from mvs_tpu.train.tasks import CascadeTask, MVSNetTask, PointTask, PyramidTask

__all__ = [
    "cascade_loss", "masked_mae", "masked_smooth_l1", "ohem_smooth_l1",
    "point_mvsnet_loss", "pyramid_loss", "smooth_l1",
    "abs_depth_error", "standard_metrics", "threshold_error_rate",
    "multistep_lr", "parse_milestones", "warmup_cosine_lr", "warmup_multistep_lr",
    "TrainState", "make_eval_step", "make_train_step",
    "CascadeTask", "MVSNetTask", "PointTask", "PyramidTask",
]
