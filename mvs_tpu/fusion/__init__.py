from mvs_tpu.fusion.fuse import FusionConfig, fuse_depth_maps, fuse_scene, fuse_view

__all__ = ["FusionConfig", "fuse_depth_maps", "fuse_scene", "fuse_view"]
