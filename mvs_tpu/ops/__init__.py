from mvs_tpu.ops.cost_volume import (
    variance_cost_volume, group_correlation_cost_volume, variance_from_partials,
)
from mvs_tpu.ops.regression import (
    depth_regression, photometric_confidence, regress_depth_and_confidence,
)

__all__ = [
    "variance_cost_volume", "group_correlation_cost_volume", "variance_from_partials",
    "depth_regression", "photometric_confidence", "regress_depth_and_confidence",
]
