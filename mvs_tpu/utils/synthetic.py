"""Synthetic multi-view scenes with analytic ground truth.

A textured plane z = z0 (world frame == reference camera frame) imaged by a
rig of pinhole cameras. Every quantity (images, per-view depth maps) is
computed in closed form, giving exact fixtures for warp / cost-volume /
regression / consistency / fusion tests — the test strategy the reference
implies but never automated (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["SyntheticScene", "make_plane_scene", "texture"]


def texture(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Smooth, non-periodic-ish texture over world coords; range ~[0, 1]."""
    return (
        0.5
        + 0.25 * np.sin(0.9 * x + 0.3 * y)
        + 0.15 * np.cos(1.7 * y - 0.5 * x)
        + 0.10 * np.sin(0.37 * x * y)
    )


@dataclasses.dataclass
class SyntheticScene:
    images: np.ndarray  # (V, H, W, 3) float32 in [0, 1]
    depths: np.ndarray  # (V, H, W) float32 ground-truth depth per view
    intrinsics: np.ndarray  # (V, 3, 3)
    extrinsics: np.ndarray  # (V, 4, 4) world-to-camera
    depth_min: float
    depth_max: float

    @property
    def projections(self) -> np.ndarray:
        """(V, 4, 4) packed K@E projections."""
        proj = self.extrinsics.copy()
        proj[:, :3, :4] = self.intrinsics @ self.extrinsics[:, :3, :4]
        return proj


def _look_rotation() -> np.ndarray:
    return np.eye(3)


def make_plane_scene(
    num_views: int = 3,
    height: int = 64,
    width: int = 80,
    z0: float = 10.0,
    baseline: float = 0.6,
    focal: float = 100.0,
    jitter_angle: float = 0.02,
    seed: int = 0,
) -> SyntheticScene:
    """Cameras spread along x (and slightly rotated) looking at the plane z=z0.

    View 0 is the reference with identity extrinsics.
    """
    rng = np.random.default_rng(seed)
    k = np.array(
        [[focal, 0, width / 2.0], [0, focal, height / 2.0], [0, 0, 1.0]], dtype=np.float64
    )

    intrinsics = np.stack([k] * num_views).astype(np.float64)
    extrinsics = np.stack([np.eye(4)] * num_views).astype(np.float64)
    for v in range(1, num_views):
        # Camera center at x = ±baseline steps; small rotation about y.
        cx = baseline * ((v + 1) // 2) * (1 if v % 2 == 1 else -1)
        ang = jitter_angle * rng.standard_normal()
        c, s = np.cos(ang), np.sin(ang)
        r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        center = np.array([cx, 0.0, 0.0])
        extrinsics[v, :3, :3] = r
        extrinsics[v, :3, 3] = -r @ center

    images = np.zeros((num_views, height, width, 3), dtype=np.float32)
    depths = np.zeros((num_views, height, width), dtype=np.float32)
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=0).reshape(3, -1).astype(np.float64)

    for v in range(num_views):
        r = extrinsics[v, :3, :3]
        t = extrinsics[v, :3, 3]
        center = -r.T @ t
        dirs = r.T @ (np.linalg.inv(intrinsics[v]) @ pix)  # (3, N) world-frame ray dirs
        # Intersect with plane z = z0: center_z + s * dir_z = z0.
        s = (z0 - center[2]) / dirs[2]
        world = center[:, None] + s[None] * dirs  # (3, N)
        tex = texture(world[0], world[1]).reshape(height, width)
        images[v] = np.repeat(tex[..., None], 3, axis=-1).astype(np.float32)
        # Camera-frame z of the hit point == depth map value.
        cam_z = (r @ world + t[:, None])[2]
        depths[v] = cam_z.reshape(height, width).astype(np.float32)

    return SyntheticScene(
        images=images,
        depths=depths,
        intrinsics=intrinsics.astype(np.float32),
        extrinsics=extrinsics.astype(np.float32),
        depth_min=z0 * 0.75,
        depth_max=z0 * 1.25,
    )
