"""DTU dataset readers (train + eval layouts) and task collate functions.

Layouts pinned by the reference loaders:
  * training (preprocessed DTU): Rectified/{scan}_train/rect_{v+1:03d}_{light}_r5000.png,
    Depths/{scan}_train/depth_map_{v:04d}.pfm + depth_visual_{v:04d}.png,
    Cameras/{v:08d}_cam.txt (intrinsics at the 1/4 depth resolution),
    Cameras/pair.txt              (reference MVSNet/datasets/dtu_yao.py:20-120)
  * eval: {scan}/images/{v:08d}.jpg, {scan}/cams/{v:08d}_cam.txt (full-res
    intrinsics), pair.txt; images rescaled so max dims fit and H/W align to a
    multiple of `align`                (reference CasMVSNet/datasets/general_eval.py:59-109)

Samples are plain numpy dicts; collate_* functions stack them into the batch
layouts the train.tasks adapters expect.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from mvs_tpu.io.cams import read_cam_file
from mvs_tpu.io.pairs import read_pair_file
from mvs_tpu.io.pfm import read_pfm

__all__ = [
    "read_image", "imagenet_normalize", "DTUTrainDataset", "DTUEvalDataset",
    "collate_mvsnet", "collate_cascade", "collate_pyramid", "collate_point",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def read_image(path) -> np.ndarray:
    """(H, W, 3) float32 in [0, 1].

    cv2 decode when available: its JPEG/PNG decode releases the GIL, so the
    DataLoader's thread pool actually scales (measured at 1152x864 DTU
    shapes: PIL throughput DEGRADES with threads — 5.9 samples/s at 1
    thread down to 1.3 at 16 — while cv2 scales; benchmarks/bench_loader.py,
    benchmarks/PERF_NOTES.md). PIL fallback keeps exotic formats working."""
    try:
        import cv2

        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(
                np.float32) / 255.0
    except Exception:
        pass
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0


def imagenet_normalize(img: np.ndarray) -> np.ndarray:
    """The MVSNet_pl input normalization (reference datasets/dtu.py:71-81)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


@dataclasses.dataclass
class DTUTrainDataset:
    """Preprocessed-DTU training split. One item = one (scan, light, ref_view)."""

    root: str
    scans: list
    num_views: int = 3
    num_depth: int = 192
    interval_scale: float = 1.06
    lights: tuple = tuple(range(7))
    # Cameras/ intrinsics are at depth (1/4) resolution; images are 4x that.
    image_to_depth_scale: int = 4

    def __post_init__(self):
        self.root = Path(self.root)
        pair_path = self.root / "Cameras" / "pair.txt"
        pairs = read_pair_file(pair_path)
        # Keep only light conditions that actually exist on disk (the official
        # preprocessed set has 7; synthetic fixtures may have fewer).
        if self.scans:
            probe = self.root / "Rectified" / f"{self.scans[0]}_train"
            available = sorted(
                int(p.stem.split("_")[2]) for p in probe.glob("rect_001_*_r5000.png")
            )
            if available:
                requested = [l for l in self.lights if l in available]
                self.lights = tuple(requested or available)
        self.metas = [
            (scan, light, ref, srcs)
            for scan in self.scans
            for light in self.lights
            for ref, srcs in pairs
            if len(srcs) >= self.num_views - 1
        ]

    def __len__(self):
        return len(self.metas)

    def __getitem__(self, idx: int) -> dict:
        scan, light, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + list(src_views[: self.num_views - 1])

        imgs, intr, extr = [], [], []
        depth = mask = depth_values = None
        depth_min = depth_interval = None
        for i, vid in enumerate(view_ids):
            img_path = (self.root / "Rectified" / f"{scan}_train"
                        / f"rect_{vid + 1:03d}_{light}_r5000.png")
            cam_path = self.root / "Cameras" / f"{vid:08d}_cam.txt"
            imgs.append(read_image(img_path))
            cam = read_cam_file(cam_path, self.interval_scale)
            intr.append(cam.intrinsics)
            extr.append(cam.extrinsics)
            if i == 0:
                depth_min, depth_interval = cam.depth_min, cam.depth_interval
                depth_values = (
                    depth_min + np.arange(self.num_depth, dtype=np.float32)
                    * depth_interval
                )
                depth = np.asarray(
                    read_pfm(self.root / "Depths" / f"{scan}_train"
                             / f"depth_map_{vid:04d}.pfm")[0], np.float32)
                vis_path = (self.root / "Depths" / f"{scan}_train"
                            / f"depth_visual_{vid:04d}.png")
                if vis_path.exists():
                    mask = (read_image(vis_path)[..., 0] > 0.5).astype(np.float32)
                else:
                    mask = (depth > depth_min).astype(np.float32)

        return {
            "scan": scan, "light": light, "view_ids": view_ids,
            "imgs": np.stack(imgs),  # (V, H, W, 3)
            # Depth-resolution intrinsics as stored; callers scale per stage.
            "intrinsics": np.stack(intr), "extrinsics": np.stack(extr),
            "depth_values": depth_values,
            "depth_min": np.float32(depth_min),
            "depth_max": np.float32(depth_min + (self.num_depth - 1) * depth_interval),
            "depth_interval": np.float32(depth_interval),
            "depth_gt": depth, "mask": mask,  # at 1/4 (depth) resolution
        }


def _scale_to_fit(img: np.ndarray, intrinsics: np.ndarray, max_h: int,
                  max_w: int, align: int):
    """Rescale so dims fit (max_h, max_w) and align to `align` (general_eval.py:92-109)."""
    import cv2

    h, w = img.shape[:2]
    scale = min(max_h / h, max_w / w, 1.0)
    new_h = (int(h * scale) // align) * align
    new_w = (int(w * scale) // align) * align
    sy, sx = new_h / h, new_w / w
    img2 = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    k = intrinsics.copy()
    k[0] *= sx
    k[1] *= sy
    return img2, k


@dataclasses.dataclass
class DTUEvalDataset:
    """Eval layout: one item = one reference view of one scan."""

    root: str
    scans: list
    num_views: int = 5
    num_depth: int = 192
    interval_scale: float = 1.06
    max_h: int = 864
    max_w: int = 1152
    align: int = 32

    def __post_init__(self):
        self.root = Path(self.root)
        self.metas = []
        for scan in self.scans:
            scan_dir = self.root / scan
            pair_path = scan_dir / "pair.txt"
            if not pair_path.exists():
                pair_path = self.root / "pair.txt"
            for ref, srcs in read_pair_file(pair_path):
                if len(srcs) >= self.num_views - 1:
                    self.metas.append((scan, ref, srcs))

    def __len__(self):
        return len(self.metas)

    def __getitem__(self, idx: int) -> dict:
        scan, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + list(src_views[: self.num_views - 1])
        scan_dir = self.root / scan

        imgs, intr, extr = [], [], []
        depth_min = depth_interval = None
        for i, vid in enumerate(view_ids):
            img = read_image(scan_dir / "images" / f"{vid:08d}.jpg")
            cam = read_cam_file(scan_dir / "cams" / f"{vid:08d}_cam.txt",
                                self.interval_scale)
            img, k = _scale_to_fit(img, cam.intrinsics, self.max_h, self.max_w,
                                   self.align)
            imgs.append(img)
            intr.append(k)
            extr.append(cam.extrinsics)
            if i == 0:
                depth_min, depth_interval = cam.depth_min, cam.depth_interval

        return {
            "scan": scan, "ref_view": ref_view, "view_ids": view_ids,
            "imgs": np.stack(imgs),
            "intrinsics": np.stack(intr),  # full (rescaled) image resolution
            "extrinsics": np.stack(extr),
            "depth_values": (
                depth_min + np.arange(self.num_depth, dtype=np.float32)
                * depth_interval
            ),
            "depth_min": np.float32(depth_min),
            "depth_max": np.float32(depth_min + (self.num_depth - 1) * depth_interval),
            "depth_interval": np.float32(depth_interval),
        }


def _compose(intr, extr):
    proj = extr.copy()
    proj[..., :3, :4] = intr @ extr[..., :3, :4]
    return proj


def _scale_k(intr, s):
    k = intr.copy()
    k[..., :2, :] *= s
    return k


def _stack(samples, key):
    return np.stack([s[key] for s in samples])


def _downsample(depth: np.ndarray, factor: int) -> np.ndarray:
    return depth[..., ::factor, ::factor]


def collate_mvsnet(samples: list[dict]) -> dict:
    """Train batch for MVSNetTask (projections at depth/feature res)."""
    intr = _stack(samples, "intrinsics")
    extr = _stack(samples, "extrinsics")
    return {
        "imgs": _stack(samples, "imgs"),
        "proj_matrices": _compose(intr, extr),
        "depth_values": _stack(samples, "depth_values"),
        "depth_gt": _stack(samples, "depth_gt"),
        "mask": _stack(samples, "mask"),
    }


def collate_cascade(samples: list[dict]) -> dict:
    """Train batch for CascadeTask: stage projections at 1x/2x/4x the stored
    (1/4-res) intrinsics; GT pyramid {stage1: 1/4 ... stage3: 1/1 of imgs}."""
    intr = _stack(samples, "intrinsics")
    extr = _stack(samples, "extrinsics")
    gt = _stack(samples, "depth_gt")
    mask = _stack(samples, "mask")
    import cv2

    b, h, w = gt.shape
    proj, gt_ms, mask_ms = {}, {}, {}
    for i, s in enumerate((1, 2, 4)):
        stage = f"stage{i + 1}"
        proj[stage] = _compose(_scale_k(intr, s), extr)
        if s == 1:
            gt_ms[stage], mask_ms[stage] = gt, mask
        else:
            gt_ms[stage] = np.stack([
                cv2.resize(g, (w * s, h * s), interpolation=cv2.INTER_NEAREST)
                for g in gt])
            mask_ms[stage] = np.stack([
                cv2.resize(m, (w * s, h * s), interpolation=cv2.INTER_NEAREST)
                for m in mask])
    return {
        "imgs": _stack(samples, "imgs"),
        "proj_matrices": proj,
        "depth_values": _stack(samples, "depth_values"),
        "depth_gt": gt_ms, "mask": mask_ms,
    }


def collate_pyramid(samples: list[dict], num_levels: int = 2) -> dict:
    """Train batch for PyramidTask (CVP/AACVP): full-image-res intrinsics,
    GT pyramid finest-first. The stored 1/4-res intrinsics scale up by 4."""
    intr = _scale_k(_stack(samples, "intrinsics"), 4.0)
    gt = _stack(samples, "depth_gt")
    # CVP runs at the GT resolution: upsample imgs' GT pyramid by subsampling.
    import cv2

    b, h, w = gt.shape
    gt_full = np.stack([
        cv2.resize(g, (w * 4, h * 4), interpolation=cv2.INTER_NEAREST) for g in gt
    ])
    gt_levels = [gt_full]
    for _ in range(num_levels - 1):
        gt_levels.append(gt_levels[-1][:, ::2, ::2])
    dmin = _stack(samples, "depth_min")
    return {
        "imgs": _stack(samples, "imgs"),
        "intrinsics": intr,
        "extrinsics": _stack(samples, "extrinsics"),
        "depth_min": dmin,
        "depth_max": _stack(samples, "depth_max"),
        "depth_gt_levels": gt_levels,
        "mask_levels": [
            (g > dmin[:, None, None]).astype(np.float32) for g in gt_levels
        ],
    }


def collate_point(samples: list[dict]) -> dict:
    """Train batch for PointTask: full-image-res intrinsics + full-res GT."""
    import cv2

    intr = _scale_k(_stack(samples, "intrinsics"), 4.0)
    gt = _stack(samples, "depth_gt")
    b, h, w = gt.shape
    gt_full = np.stack([
        cv2.resize(g, (w * 4, h * 4), interpolation=cv2.INTER_NEAREST) for g in gt
    ])
    return {
        "imgs": _stack(samples, "imgs"),
        "intrinsics": intr,
        "extrinsics": _stack(samples, "extrinsics"),
        "depth_start": _stack(samples, "depth_min"),
        "depth_interval": _stack(samples, "depth_interval"),
        "depth_gt": gt_full,
    }
