"""Fuse per-view depth maps into one PLY per scan — scan-parallel.

    python -m mvs_tpu.cli fuse --out outputs/ [--scan scanX] [key=value ...]

Consumes the on-disk layout cli.infer writes (depth_est/, confidence/, cams/)
plus the scan's pair.txt, applies the photometric+geometric consensus fuser
(mvs_tpu.fusion) and writes <scan>/fused.ply — the final3d_model.ply
equivalent of the fusibile path (SURVEY.md §3.5).

Parallelism (the role of the reference's multiprocessing Pool over scans,
CasMVSNet/test.py:413-444): scans with identical (V, H, W) are stacked and
fused as ONE sharded program over the mesh 'data' axis — each device fuses
its own scans concurrently — while scan IO (PFM/JPEG decode) runs in a
thread pool that prefetches the next group during device compute, and the
host-side compaction + PLY write of the previous group overlaps too.
"""

from __future__ import annotations

import argparse
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from mvs_tpu.fusion import (
    FusionConfig, fuse_depth_maps, make_batched_scene_fusion, pad_pairs,
)
from mvs_tpu.io import read_cam_file, read_pair_file, read_pfm, write_ply
from mvs_tpu.utils.config import load_config

__all__ = ["main", "fuse_scan_dir", "load_scan_arrays", "fuse_scans_parallel"]


def load_scan_arrays(scan_dir: Path, pair_path: Path):
    """Read one scan's fusion inputs from the cli.infer layout."""
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
    remapped = [
        (id_map[r], [id_map[s] for s in srcs if s in id_map])
        for r, srcs in pairs if r in id_map
    ]
    return {
        "name": scan_dir.name,
        "dir": scan_dir,
        "depths": depths,
        "confs": confs,
        "images": images if have_imgs else None,
        "intr": np.stack(intr),
        "extr": np.stack(extr),
        "pairs": remapped,
    }


def _compact_write(scan, mask, world, out_path=None):
    """Host-side compaction of accepted points + PLY write for one scan."""
    all_xyz, all_rgb = [], []
    for ref_view, src_views in scan["pairs"]:
        if not src_views:
            continue
        m = mask[ref_view]
        all_xyz.append(world[ref_view][m])
        if scan["images"] is not None:
            img = np.asarray(scan["images"][ref_view])
            all_rgb.append((np.clip(img[m], 0, 1) * 255).astype(np.uint8))
    xyz = (np.concatenate(all_xyz, axis=0) if all_xyz
           else np.zeros((0, 3), np.float32)).astype(np.float32)
    rgb = np.concatenate(all_rgb, axis=0) if all_rgb else None
    out_path = out_path or (scan["dir"] / "fused.ply")
    write_ply(out_path, xyz, rgb=rgb)
    print(f"{scan['name']}: {len(xyz)} points -> {out_path}")
    return out_path


def fuse_scan_dir(scan_dir: Path, pair_path: Path, fusion_cfg: FusionConfig,
                  out_path: Path | None = None):
    """Single-scan path (kept for --scan and as the odd-shape fallback)."""
    scan = load_scan_arrays(scan_dir, pair_path)
    xyz, rgb = fuse_depth_maps(
        scan["depths"], scan["confs"], scan["images"], scan["intr"],
        scan["extr"], scan["pairs"], fusion_cfg,
    )
    out_path = out_path or (scan_dir / "fused.ply")
    write_ply(out_path, xyz, rgb=rgb)
    print(f"{scan_dir.name}: {len(xyz)} points -> {out_path}")
    return out_path


def fuse_scans_parallel(scan_jobs, fcfg: FusionConfig, io_workers: int = 4):
    """Fuse many scans: device-parallel over the mesh 'data' axis, with
    threaded IO prefetch and overlapped host compaction.

    scan_jobs: list of (scan_dir, pair_path).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mvs_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev)
    fuse_fn = make_batched_scene_fusion(mesh, fcfg)
    shard = NamedSharding(mesh, P("data"))

    with ThreadPoolExecutor(max_workers=io_workers) as io_pool, \
            ThreadPoolExecutor(max_workers=2) as write_pool:
        loaded = [io_pool.submit(load_scan_arrays, sd, pp)
                  for sd, pp in scan_jobs]
        # Group loaded scans by (V, H, W): one compiled program per group.
        groups: dict = {}
        for fut in loaded:
            scan = fut.result()
            groups.setdefault(scan["depths"].shape, []).append(scan)

        writes = []
        for shape, scans in groups.items():
            max_s = max(
                (len(s) for sc in scans for _, s in sc["pairs"]), default=1
            ) or 1
            for i in range(0, len(scans), n_dev):
                chunk = scans[i:i + n_dev]
                real = len(chunk)
                # Pad the batch to the device count by repeating the last
                # scan; its outputs are discarded.
                chunk = chunk + [chunk[-1]] * (n_dev - real)
                idx_valid = [pad_pairs(sc["pairs"], shape[0], max_s)
                             for sc in chunk]
                args = [
                    np.stack([sc["depths"] for sc in chunk]),
                    np.stack([sc["confs"] for sc in chunk]),
                    np.stack([sc["intr"] for sc in chunk]),
                    np.stack([sc["extr"] for sc in chunk]),
                    np.stack([iv[0] for iv in idx_valid]),
                    np.stack([iv[1] for iv in idx_valid]),
                ]
                args = [jax.device_put(a, shard) for a in args]
                mask, world = fuse_fn(*args)
                mask = np.asarray(mask)
                world = np.asarray(world)
                for j in range(real):
                    writes.append(write_pool.submit(
                        _compact_write, chunk[j], mask[j], world[j]))
        for wfut in writes:
            wfut.result()


def main(argv=None):
    p = argparse.ArgumentParser(prog="mvs_tpu fuse")
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="outputs")
    p.add_argument("--scan", default=None)
    p.add_argument("--pair", default=None, help="pair.txt (defaults per scan)")
    p.add_argument("--io-workers", type=int, default=4)
    p.add_argument("--serial", action="store_true",
                   help="force the one-scan-at-a-time path")
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

    def pair_for(scan):
        scan_dir = out_root / scan
        if args.pair:
            return Path(args.pair)
        for cand in (scan_dir / "pair.txt",
                     Path(cfg.data.eval_root) / scan / "pair.txt",
                     Path(cfg.data.eval_root) / "pair.txt"):
            if cand.exists():
                return cand
        raise FileNotFoundError(f"no pair.txt found for {scan}")

    jobs = [(out_root / s, pair_for(s)) for s in scans]
    if args.serial or len(jobs) == 1:
        for scan_dir, pair in jobs:
            fuse_scan_dir(scan_dir, pair, fcfg)
    else:
        fuse_scans_parallel(jobs, fcfg, io_workers=args.io_workers)


if __name__ == "__main__":
    main()
