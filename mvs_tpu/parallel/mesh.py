"""Device-mesh construction with MVS-specific named axes.

The reference's only parallelism is data-parallel DDP over NCCL
(CasMVSNet/train.py:297-302). A TPU MVS engine has richer model-parallel axes
(SURVEY.md §2.4 P7): besides 'data' (scans / ref views), the cost volume can
be sharded over source views ('view', partial Σf/Σf² + psum), depth-hypothesis
slabs ('depth', elementwise-independent, conv halos handled by GSPMD), and
spatial tiles ('space', halo exchange for the 3D U-Net).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["AXES", "make_mesh", "data_parallel_mesh"]

AXES = ("data", "view", "depth", "space")


def make_mesh(data: int = 1, view: int = 1, depth: int = 1, space: int = 1,
              devices=None) -> Mesh:
    """Build a mesh with the canonical axis order ('data','view','depth','space').

    The product of axis sizes must equal the device count. Axis order places
    'space' innermost so spatial halo exchange rides the fastest ICI links.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    shape = (data, view, depth, space)
    if int(np.prod(shape)) != devices.size:
        raise ValueError(
            f"mesh shape {shape} needs {np.prod(shape)} devices, have {devices.size}"
        )
    return Mesh(devices.reshape(shape), AXES)


def data_parallel_mesh(devices=None) -> Mesh:
    """All devices on the 'data' axis (the DDP-equivalent layout)."""
    devices = devices if devices is not None else jax.devices()
    return make_mesh(data=len(devices), devices=devices)
