"""mvs_tpu — a TPU-native multi-view-stereo reconstruction engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
learned-MVS monorepo (doubleZ0108/MVS): plane-sweep cost volumes, 3D-CNN cost
regularization (single-volume / cascade / pyramid / point-refinement variants),
soft-argmin depth regression, photometric+geometric depth fusion, and the DTU
accuracy/completeness evaluation protocol.

Layering (bottom-up):
  io/        PFM / cam / pair / PLY codecs, DTU dataset, host data pipeline
  geometry/  projection matrices, homography grids, depth hypotheses, consistency
  ops/       compute ops: plane-sweep warp + cost volumes (XLA + Pallas kernels)
  nn/        flax modules: conv blocks, feature extractors, 3D U-Net regularizers
  models/    MVSNet, CasMVSNet, CVP-MVSNet, AACVP-MVSNet, Point-MVSNet
  parallel/  device mesh, shardings, collectives (the distributed backend)
  train/     unified training loop, losses, metrics, schedules, checkpointing
  fusion/    depth-map filtering and point-cloud fusion (fusibile equivalent)
  dtu_eval/  DTU accuracy/completeness protocol (MATLAB-eval equivalent)
  cli/       train / infer / fuse / evaluate / profile entry points
"""

__version__ = "0.1.0"
