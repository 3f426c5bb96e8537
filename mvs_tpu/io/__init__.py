from mvs_tpu.io.pfm import read_pfm, write_pfm
from mvs_tpu.io.cams import CameraParams, read_cam_file, write_cam_file
from mvs_tpu.io.pairs import read_pair_file, write_pair_file
from mvs_tpu.io.ply import read_ply, write_ply

__all__ = [
    "read_pfm", "write_pfm",
    "CameraParams", "read_cam_file", "write_cam_file",
    "read_pair_file", "write_pair_file",
    "read_ply", "write_ply",
]
