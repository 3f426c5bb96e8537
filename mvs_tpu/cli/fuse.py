"""Fuse per-view depth maps into one PLY per scan.

    python -m mvs_tpu.cli fuse --out outputs/ [--scan scanX] [key=value ...]

Consumes the on-disk layout cli.infer writes (depth_est/, confidence/, cams/)
plus the scan's pair.txt, applies the photometric+geometric consensus fuser
(mvs_tpu.fusion) and writes <scan>/fused.ply — the final3d_model.ply
equivalent of the fusibile path (SURVEY.md §3.5).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from mvs_tpu.fusion import FusionConfig, fuse_depth_maps
from mvs_tpu.io import read_cam_file, read_pair_file, read_pfm, write_ply
from mvs_tpu.utils.config import load_config

__all__ = ["main", "fuse_scan_dir"]


def fuse_scan_dir(scan_dir: Path, pair_path: Path, fusion_cfg: FusionConfig,
                  out_path: Path | None = None):
    pairs = read_pair_file(pair_path)
    view_ids = sorted(
        int(p.stem) for p in (scan_dir / "depth_est").glob("*.pfm")
    )
    id_map = {vid: i for i, vid in enumerate(view_ids)}

    def _load_image(vid):
        for ext in (".jpg", ".png"):
            p = scan_dir / "images" / f"{vid:08d}{ext}"
            if p.exists():
                from PIL import Image

                return np.asarray(Image.open(p), np.float32) / 255.0
        p = scan_dir / "images" / f"{vid:08d}.npy"  # legacy layout
        return np.load(p) if p.exists() else None

    depths, confs, images, intr, extr = [], [], [], [], []
    for vid in view_ids:
        depths.append(read_pfm(scan_dir / "depth_est" / f"{vid:08d}.pfm")[0])
        confs.append(read_pfm(scan_dir / "confidence" / f"{vid:08d}.pfm")[0])
        cam = read_cam_file(scan_dir / "cams" / f"{vid:08d}_cam.txt")
        images.append(_load_image(vid))
        intr.append(cam.intrinsics)
        extr.append(cam.extrinsics)

    depths = np.stack(depths)
    h, w = depths.shape[1:]
    confs = np.stack(confs)
    if confs.shape[1:] != (h, w):
        import cv2

        confs = np.stack([cv2.resize(c, (w, h)) for c in confs])
    have_imgs = all(im is not None for im in images)
    if have_imgs:
        import cv2

        images = np.stack([
            cv2.resize(im, (w, h)) if im.shape[:2] != (h, w) else im
            for im in images
        ])
    # cli.infer writes cams already rescaled to the depth-map resolution, so
    # the (depth, K) pair is consistent here by contract.
    intr = np.stack(intr)
    extr = np.stack(extr)

    remapped = [
        (id_map[r], [id_map[s] for s in srcs if s in id_map])
        for r, srcs in pairs if r in id_map
    ]
    xyz, rgb = fuse_depth_maps(
        depths, confs, images if have_imgs else None, intr, extr,
        remapped, fusion_cfg,
    )
    out_path = out_path or (scan_dir / "fused.ply")
    write_ply(out_path, xyz, rgb=rgb)
    print(f"{scan_dir.name}: {len(xyz)} points -> {out_path}")
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(prog="mvs_tpu fuse")
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="outputs")
    p.add_argument("--scan", default=None)
    p.add_argument("--pair", default=None, help="pair.txt (defaults per scan)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    from mvs_tpu.utils.platform import ensure_platform

    ensure_platform()
    fcfg = FusionConfig(
        conf_thresh=cfg.fusion.conf_thresh,
        num_consistent=cfg.fusion.num_consistent,
        pixel_thresh=cfg.fusion.pixel_thresh,
        depth_thresh=cfg.fusion.depth_thresh,
        depth_mode=cfg.fusion.depth_mode,
    )

    out_root = Path(args.out)
    scans = [args.scan] if args.scan else sorted(
        d.name for d in out_root.iterdir() if (d / "depth_est").is_dir()
    )
    for scan in scans:
        scan_dir = out_root / scan
        pair = Path(args.pair) if args.pair else None
        if pair is None:
            for cand in (scan_dir / "pair.txt",
                         Path(cfg.data.eval_root) / scan / "pair.txt",
                         Path(cfg.data.eval_root) / "pair.txt"):
                if cand.exists():
                    pair = cand
                    break
        if pair is None:
            raise FileNotFoundError(f"no pair.txt found for {scan}")
        fuse_scan_dir(scan_dir, pair, fcfg)


if __name__ == "__main__":
    main()
