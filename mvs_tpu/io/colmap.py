"""COLMAP sparse reconstruction -> MVSNet input layout converter.

Reimplements the reference converter (CasMVSNet/colmap2mvsnet.py, 469 LoC)
with vectorized numpy:
  * parses COLMAP text or binary models (cameras/images/points3D);
  * per-view depth range from the z-quantile means of its visible track
    points (colmap2mvsnet.py:370-373), depth count from the inverse-depth
    pixel rule (:379-393) unless --max_d is given;
  * pairwise view-selection scores: for every 3D point seen by both views,
    exp(-(θ-θ0)²/2σ²) of the baseline angle at the point, σ piecewise around
    θ0 (calc_score, :279-294) — computed here as one vectorized pass per pair;
  * writes {save}/cams/%08d_cam.txt, pair.txt, images/.

Usage: python -m mvs_tpu.io.colmap --dense_folder D --save_folder S
"""

from __future__ import annotations

import argparse
import dataclasses
import shutil
import struct
from pathlib import Path

import numpy as np

from mvs_tpu.io.cams import CameraParams, write_cam_file
from mvs_tpu.io.pairs import write_pair_file

__all__ = ["read_colmap_model", "convert_colmap", "main"]


@dataclasses.dataclass
class ColmapImage:
    image_id: int
    qvec: np.ndarray
    tvec: np.ndarray
    camera_id: int
    name: str
    point3d_ids: np.ndarray  # (-1 = no track)


def _qvec_to_rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])


def _camera_k(model: str, params) -> np.ndarray:
    p = list(params)
    if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
        f, cx, cy = p[0], p[1], p[2]
        return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    if model in ("PINHOLE", "OPENCV", "FULL_OPENCV"):
        fx, fy, cx, cy = p[0], p[1], p[2], p[3]
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    raise ValueError(f"unsupported COLMAP camera model {model}")


_CAM_MODEL_IDS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}


def _read_cameras_text(path):
    cams = {}
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        cams[int(parts[0])] = _camera_k(parts[1], [float(x) for x in parts[4:]])
    return cams


def _read_cameras_bin(path):
    cams = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cam_id, model_id, _, _ = struct.unpack("<iiQQ", f.read(24))
            name, num_params = _CAM_MODEL_IDS[model_id]
            params = struct.unpack(f"<{num_params}d", f.read(8 * num_params))
            cams[cam_id] = _camera_k(name, params)
    return cams


def _read_images_text(path):
    images = {}
    lines = [ln for ln in open(path)
             if not ln.startswith("#") and ln.strip()]
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        pts = lines[i + 1].split()
        images[int(parts[0])] = ColmapImage(
            image_id=int(parts[0]),
            qvec=np.array([float(x) for x in parts[1:5]]),
            tvec=np.array([float(x) for x in parts[5:8]]),
            camera_id=int(parts[8]),
            name=parts[9],
            point3d_ids=np.array([int(x) for x in pts[2::3]], dtype=np.int64),
        )
    return images


def _read_images_bin(path):
    images = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            image_id = struct.unpack("<i", f.read(4))[0]
            qvec = np.array(struct.unpack("<4d", f.read(32)))
            tvec = np.array(struct.unpack("<3d", f.read(24)))
            camera_id = struct.unpack("<i", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (num_pts,) = struct.unpack("<Q", f.read(8))
            raw = np.frombuffer(
                f.read(24 * num_pts),
                dtype=[("x", "<f8"), ("y", "<f8"), ("id", "<i8")],
            )
            ids = raw["id"] if num_pts else np.empty(0, np.int64)
            images[image_id] = ColmapImage(
                image_id=image_id, qvec=qvec, tvec=tvec, camera_id=camera_id,
                name=name.decode(), point3d_ids=ids.copy(),
            )
    return images


def _read_points_text(path):
    ids, xyz = [], []
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        ids.append(int(parts[0]))
        xyz.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return np.array(ids, np.int64), np.array(xyz)


def _read_points_bin(path):
    ids, xyz = [], []
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            pid = struct.unpack("<Q", f.read(8))[0]
            p = struct.unpack("<3d", f.read(24))
            f.read(3 + 8)  # rgb + error
            (track_len,) = struct.unpack("<Q", f.read(8))
            f.read(8 * track_len)
            ids.append(pid)
            xyz.append(p)
    return np.array(ids, np.int64), np.array(xyz)


def read_colmap_model(model_dir):
    """Returns (cams {id: K}, images {id: ColmapImage}, point_ids, point_xyz)."""
    model_dir = Path(model_dir)
    if (model_dir / "cameras.txt").exists():
        return (_read_cameras_text(model_dir / "cameras.txt"),
                _read_images_text(model_dir / "images.txt"),
                *_read_points_text(model_dir / "points3D.txt"))
    if (model_dir / "cameras.bin").exists():
        return (_read_cameras_bin(model_dir / "cameras.bin"),
                _read_images_bin(model_dir / "images.bin"),
                *_read_points_bin(model_dir / "points3D.bin"))
    raise FileNotFoundError(f"no COLMAP model in {model_dir}")


def _view_scores(images_sorted, centers, pid_to_xyz, theta0, sigma1, sigma2):
    """Pairwise view-selection score matrix, vectorized over shared points."""
    n = len(images_sorted)
    point_sets = [
        {int(p) for p in im.point3d_ids if p != -1 and int(p) in pid_to_xyz}
        for im in images_sorted
    ]
    score = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            shared = point_sets[i] & point_sets[j]
            if not shared:
                continue
            pts = np.array([pid_to_xyz[p] for p in shared])  # (S, 3)
            vi = centers[i] - pts
            vj = centers[j] - pts
            cos = np.einsum("sk,sk->s", vi, vj) / (
                np.linalg.norm(vi, axis=1) * np.linalg.norm(vj, axis=1) + 1e-12
            )
            theta = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
            sigma = np.where(theta <= theta0, sigma1, sigma2)
            s = np.exp(-((theta - theta0) ** 2) / (2 * sigma**2)).sum()
            score[i, j] = score[j, i] = s
    return score


def convert_colmap(dense_folder, save_folder, max_d: int = 192,
                   interval_scale: float = 1.0, theta0: float = 5.0,
                   sigma1: float = 1.0, sigma2: float = 10.0,
                   min_ratio: float = 0.01, max_ratio: float = 0.1,
                   num_src: int = 10, copy_images: bool = True):
    dense = Path(dense_folder)
    save = Path(save_folder)
    cams_k, images, point_ids, point_xyz = read_colmap_model(dense / "sparse")
    pid_to_xyz = {int(pid): point_xyz[k] for k, pid in enumerate(point_ids)}

    images_sorted = [images[k] for k in sorted(images)]
    n = len(images_sorted)
    extr = np.stack([
        np.block([[_qvec_to_rotmat(im.qvec), im.tvec[:, None]],
                  [np.zeros((1, 3)), np.ones((1, 1))]])
        for im in images_sorted
    ])
    centers = np.stack([-extr[i, :3, :3].T @ extr[i, :3, 3] for i in range(n)])

    # Depth ranges.
    ranges = []
    for i, im in enumerate(images_sorted):
        pts = np.array([
            pid_to_xyz[int(p)] for p in im.point3d_ids
            if p != -1 and int(p) in pid_to_xyz
        ])
        if len(pts) == 0:
            ranges.append((1.0, 1.0, max_d or 192, float(max_d or 192)))
            continue
        zs = np.sort((extr[i, :3, :3] @ pts.T + extr[i, :3, 3:4])[2])
        num_min = max(1, int(len(zs) * min_ratio))
        num_max = max(5, int(len(zs) * max_ratio))
        depth_min = float(zs[:num_min].mean())
        depth_max = float(zs[-num_max:].mean())
        if max_d == 0:
            # Inverse-depth count: hypotheses spaced so adjacent planes move
            # the principal point ~1 px (colmap2mvsnet.py:379-393).
            k = cams_k[im.camera_id]
            p1 = np.linalg.inv(k) @ [k[0, 2], k[1, 2], 1.0] * depth_min
            p2 = np.linalg.inv(k) @ [k[0, 2] + 1.0, k[1, 2], 1.0] * depth_min
            step = np.linalg.norm(p2 - p1)
            depth_num = int(
                (1 / depth_min - 1 / depth_max)
                / (1 / depth_min - 1 / (depth_min + step))
            )
        else:
            depth_num = max_d
        interval = (depth_max - depth_min) / (depth_num - 1) / interval_scale
        ranges.append((depth_min, interval, depth_num, depth_max))

    score = _view_scores(images_sorted, centers, pid_to_xyz, theta0, sigma1,
                         sigma2)

    # Write cams, pair, images.
    (save / "cams").mkdir(parents=True, exist_ok=True)
    pairs = []
    for i, im in enumerate(images_sorted):
        dmin, interval, dnum, dmax = ranges[i]
        write_cam_file(save / "cams" / f"{i:08d}_cam.txt", CameraParams(
            intrinsics=cams_k[im.camera_id].astype(np.float32),
            extrinsics=extr[i].astype(np.float32),
            depth_min=dmin, depth_interval=interval,
            num_depth=dnum, depth_max=dmax,
        ))
        order = np.argsort(score[i])[::-1][:num_src]
        pairs.append((i, [(int(k), float(score[i, k])) for k in order
                          if score[i, k] > 0]))
    write_pair_file(save / "pair.txt", pairs)

    if copy_images:
        (save / "images").mkdir(parents=True, exist_ok=True)
        for i, im in enumerate(images_sorted):
            src = dense / "images" / im.name
            if src.exists():
                dst = save / "images" / f"{i:08d}.jpg"
                if src.suffix.lower() in (".jpg", ".jpeg"):
                    shutil.copyfile(src, dst)
                else:
                    from PIL import Image

                    Image.open(src).convert("RGB").save(dst, quality=98)
    return ranges, score


def main(argv=None):
    p = argparse.ArgumentParser(prog="mvs_tpu colmap2mvsnet")
    p.add_argument("--dense_folder", required=True,
                   help="COLMAP workspace with sparse/ and images/")
    p.add_argument("--save_folder", required=True)
    p.add_argument("--max_d", type=int, default=192,
                   help="0 = derive from inverse-depth pixel rule")
    p.add_argument("--interval_scale", type=float, default=1.0)
    p.add_argument("--theta0", type=float, default=5.0)
    p.add_argument("--sigma1", type=float, default=1.0)
    p.add_argument("--sigma2", type=float, default=10.0)
    args = p.parse_args(argv)
    convert_colmap(args.dense_folder, args.save_folder, max_d=args.max_d,
                   interval_scale=args.interval_scale, theta0=args.theta0,
                   sigma1=args.sigma1, sigma2=args.sigma2)
    print(f"wrote MVSNet inputs to {args.save_folder}")


if __name__ == "__main__":
    main()
