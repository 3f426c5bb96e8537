from mvs_tpu.models.mvsnet import MVSNet, RefineNet

__all__ = ["MVSNet", "RefineNet"]
