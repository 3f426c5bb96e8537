from mvs_tpu.parallel.mesh import AXES, data_parallel_mesh, make_mesh
from mvs_tpu.parallel.sharding import (
    ShardingPlan, data_parallel_plan, replicate, shard_batch, volume_sharded_plan,
)
from mvs_tpu.parallel.collectives import (
    make_view_variance, psum_metrics, view_sharded_variance_volume,
)
from mvs_tpu.parallel.distributed import maybe_initialize_distributed

__all__ = [
    "AXES", "data_parallel_mesh", "make_mesh",
    "ShardingPlan", "data_parallel_plan", "replicate", "shard_batch",
    "volume_sharded_plan",
    "make_view_variance", "psum_metrics", "view_sharded_variance_volume",
    "maybe_initialize_distributed",
]
