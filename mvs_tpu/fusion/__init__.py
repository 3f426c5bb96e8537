from mvs_tpu.fusion.fuse import (
    FusionConfig, fuse_depth_maps, fuse_scene, fuse_view,
    make_batched_scene_fusion, pad_pairs,
)

__all__ = ["FusionConfig", "fuse_depth_maps", "fuse_scene", "fuse_view",
           "make_batched_scene_fusion", "pad_pairs"]
