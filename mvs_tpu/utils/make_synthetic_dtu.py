"""Generate a synthetic dataset in the DTU on-disk layouts.

    python -m mvs_tpu.utils.make_synthetic_dtu --root /tmp/dtu --scans 2

Writes both the preprocessed-DTU *training* layout (Rectified/, Depths/,
Cameras/ with 1/4-res intrinsics — reference MVSNet/datasets/dtu_yao.py) and
the *eval* layout ({scan}/images, {scan}/cams, pair.txt — reference
CasMVSNet/datasets/general_eval.py), plus a GT point cloud per scan under
Points/stl/ for the DTU eval protocol. Scenes are textured planes with
analytic depth (mvs_tpu.utils.synthetic), so every pipeline stage can be
exercised end-to-end without the real dataset.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from mvs_tpu.io import CameraParams, write_cam_file, write_pair_file, write_pfm, write_ply
from mvs_tpu.utils.synthetic import make_objects_scene, make_plane_scene

__all__ = ["generate", "main"]


def generate(root, num_scans=2, num_views=5, height=64, width=96,
             num_depth=16, num_lights=2, z0=10.0, tilt=(0.0, 0.0),
             scene_type="plane"):
    """tilt: plane slope (dz/dx, dz/dy). A nonzero tilt makes GT depth vary
    across the image, so an end-to-end quality number cannot be faked by the
    soft-argmin mid-range prior (the plane z=z0 sits at the ladder centre).

    scene_type 'objects' renders a tilted backdrop plus textured spheres
    (make_objects_scene): occlusion boundaries and curved surfaces that the
    plane fixture cannot produce; the GT point cloud is then built by
    unprojecting every view's analytic depth map (perfect fusion), which is
    correct for arbitrary geometry."""
    root = Path(root)
    depth_min, depth_max = z0 * 0.72, z0 * 1.28
    interval = (depth_max - depth_min) / (num_depth - 1)
    from PIL import Image

    scenes = {}
    pairs = None
    for s in range(num_scans):
        if scene_type == "objects":
            scene = make_objects_scene(num_views=num_views, height=height,
                                       width=width, z0=z0, seed=s, tilt=tilt)
        else:
            scene = make_plane_scene(num_views=num_views, height=height,
                                     width=width, z0=z0, seed=s, tilt=tilt)
        scan = f"scan{s + 1}"
        scenes[scan] = scene

        # view-selection pairs: every other view ranked by index distance.
        pairs = [
            (r, [(v, float(num_views - abs(v - r))) for v in range(num_views)
                 if v != r])
            for r in range(num_views)
        ]

        # ---- training layout ----
        for light in range(num_lights):
            for v in range(num_views):
                img = (np.clip(scene.images[v], 0, 1) * 255).astype(np.uint8)
                p = root / "Rectified" / f"{scan}_train" / (
                    f"rect_{v + 1:03d}_{light}_r5000.png")
                p.parent.mkdir(parents=True, exist_ok=True)
                Image.fromarray(img).save(p)
        for v in range(num_views):
            depth_q = scene.depths[v][::4, ::4].astype(np.float32)
            write_pfm(root / "Depths" / f"{scan}_train" / f"depth_map_{v:04d}.pfm",
                      depth_q)
            vis = (depth_q > 0).astype(np.uint8) * 255
            Image.fromarray(np.stack([vis] * 3, -1)).save(
                root / "Depths" / f"{scan}_train" / f"depth_visual_{v:04d}.png")

        # ---- eval layout ----
        for v in range(num_views):
            img = (np.clip(scene.images[v], 0, 1) * 255).astype(np.uint8)
            p = root / scan / "images" / f"{v:08d}.jpg"
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(img).save(p, quality=98)
            cam_full = CameraParams(
                intrinsics=scene.intrinsics[v].astype(np.float32),
                extrinsics=scene.extrinsics[v].astype(np.float32),
                depth_min=depth_min, depth_interval=interval,
                num_depth=num_depth, depth_max=depth_max,
            )
            write_cam_file(root / scan / "cams" / f"{v:08d}_cam.txt", cam_full)
        write_pair_file(root / scan / "pair.txt", pairs)

        # ---- GT point cloud restricted to observed surface. The real DTU
        # protocol enforces the same restriction via ObsMask
        # (Evaluation/dtu/BaseEvalMain_web.m:66-75); without it,
        # completeness is inflated by surface no pipeline could ever
        # reconstruct.
        if scene_type == "objects":
            # Unproject every view's analytic GT depth (perfect fusion) —
            # geometry-agnostic, observed-by-construction.
            pts = []
            ys_i, xs_i = np.meshgrid(np.arange(height), np.arange(width),
                                     indexing="ij")
            pix = np.stack([xs_i, ys_i, np.ones_like(xs_i)], 0
                           ).reshape(3, -1).astype(np.float64)
            for v in range(num_views):
                d = scene.depths[v].reshape(-1)
                ok = d > 0
                cam = np.linalg.inv(scene.intrinsics[v]) @ (pix * d[None])
                rt = scene.extrinsics[v]
                world = rt[:3, :3].T @ (cam - rt[:3, 3:4])
                pts.append(world[:, ok].T)
            stl = np.concatenate(pts, axis=0)
            # ~0.2-unit-ish decimation keeps eval-time KD trees small.
            stl = stl[:: max(1, len(stl) // 60000)]
        else:
            ys, xs = np.meshgrid(np.linspace(-4, 4, 160),
                                 np.linspace(-5, 5, 200), indexing="ij")
            zs = z0 + tilt[0] * xs + tilt[1] * ys
            stl = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1)
            visible = np.zeros(len(stl), bool)
            for v in range(num_views):
                rt = scene.extrinsics[v]
                cam = stl @ rt[:3, :3].T + rt[:3, 3]
                uvw = cam @ scene.intrinsics[v].T
                with np.errstate(divide="ignore", invalid="ignore"):
                    u = uvw[:, 0] / uvw[:, 2]
                    vv = uvw[:, 1] / uvw[:, 2]
                visible |= ((uvw[:, 2] > 0) & (u >= 0) & (u < width)
                            & (vv >= 0) & (vv < height))
            stl = stl[visible]
        write_ply(root / "Points" / "stl" / f"stl{s + 1:03d}_total.ply",
                  stl.astype(np.float32))

    # shared training cams at 1/4 resolution
    for v in range(num_views):
        k = scenes["scan1"].intrinsics[v].copy()
        k[:2] /= 4.0
        cam_q = CameraParams(
            intrinsics=k.astype(np.float32),
            extrinsics=scenes["scan1"].extrinsics[v].astype(np.float32),
            depth_min=depth_min, depth_interval=interval,
            num_depth=num_depth, depth_max=depth_max,
        )
        write_cam_file(root / "Cameras" / f"{v:08d}_cam.txt", cam_q)
    write_pair_file(root / "Cameras" / "pair.txt", pairs)

    for split, scans in (("train", list(scenes)[:max(1, num_scans - 1)]),
                         ("val", list(scenes)[-1:]),
                         ("test", list(scenes))):
        (root / "lists").mkdir(parents=True, exist_ok=True)
        (root / "lists" / f"{split}.txt").write_text("\n".join(scans) + "\n")
    return root


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--scans", type=int, default=2)
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--depths", type=int, default=16)
    p.add_argument("--tilt", type=float, nargs=2, default=(0.0, 0.0),
                   metavar=("DZDX", "DZDY"))
    p.add_argument("--scene", default="plane", choices=("plane", "objects"))
    args = p.parse_args(argv)
    generate(args.root, args.scans, args.views, args.height, args.width,
             args.depths, tilt=tuple(args.tilt), scene_type=args.scene)
    print(f"synthetic DTU layout written to {args.root}")


if __name__ == "__main__":
    main()
