from mvs_tpu.geometry.projection import (
    compose_projection, scale_intrinsics, relative_projection, invert_rigid,
)
from mvs_tpu.geometry.sampling import bilinear_sample, bilinear_sample_nearest_depth
from mvs_tpu.geometry.homography import pixel_grid, plane_sweep_coords, warp_src_feature
from mvs_tpu.geometry.depth import (
    uniform_depth_values, inverse_depth_values, cascade_depth_samples,
    residual_depth_hypotheses, epipolar_depth_interval,
)
from mvs_tpu.geometry.consistency import (
    ReprojectionResult, reproject_with_depth, geometric_consistency,
)

__all__ = [
    "compose_projection", "scale_intrinsics", "relative_projection", "invert_rigid",
    "bilinear_sample", "bilinear_sample_nearest_depth",
    "pixel_grid", "plane_sweep_coords", "warp_src_feature",
    "uniform_depth_values", "inverse_depth_values", "cascade_depth_samples",
    "residual_depth_hypotheses", "epipolar_depth_interval",
    "ReprojectionResult", "reproject_with_depth", "geometric_consistency",
]
