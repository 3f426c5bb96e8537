"""Gipuma/fusibile interop layer.

Exports our per-view outputs into the exact on-disk layout the external
fusibile binary consumes (reference CasMVSNet/gipuma.py:58-213):
  <out>/images/%08d.jpg                      undistorted images
  <out>/cams/%08d.jpg.P                      3x4 projection (K @ [R|t])
  <out>/2333_%08d/disp.dmb                   probability-filtered depth
  <out>/2333_%08d/normals.dmb                fake unit normals (1/sqrt(3))
and can read fusibile's consistencyCheck-*/final3d_model.ply back for eval.

This keeps drop-in compatibility with CUDA-fusibile workflows while the
native fusion path (mvs_tpu.fusion.fuse) replaces it functionally.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mvs_tpu.io.dmb import write_dmb

__all__ = ["export_gipuma_scene", "find_fusibile_output"]


def export_gipuma_scene(out_dir, depths, confs, images, intrinsics, extrinsics,
                        view_ids=None, prob_threshold: float = 0.8):
    """depths/confs (V, H, W); images (V, H, W, 3) float [0,1] or None;
    intrinsics (V,3,3); extrinsics (V,4,4). Writes the gipuma input layout."""
    out = Path(out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    (out / "cams").mkdir(parents=True, exist_ok=True)
    v = len(depths)
    view_ids = list(view_ids) if view_ids is not None else list(range(v))

    fake_normal = np.full((1, 1, 3), 1.0 / np.sqrt(3.0), dtype=np.float32)
    for i, vid in enumerate(view_ids):
        name = f"{vid:08d}"
        # probability filter (reference gipuma.py:118-131): zero low-conf depths
        depth = np.where(np.asarray(confs[i]) >= prob_threshold,
                         np.asarray(depths[i], np.float32), 0.0)
        sub = out / f"2333_{name}"
        write_dmb(sub / "disp.dmb", depth)
        h, w = depth.shape
        write_dmb(sub / "normals.dmb",
                  np.broadcast_to(fake_normal, (h, w, 3)).copy())

        p = intrinsics[i] @ np.asarray(extrinsics[i])[:3, :4]
        with open(out / "cams" / f"{name}.jpg.P", "w") as f:
            for row in p:
                f.write(" ".join(repr(float(x)) for x in row) + "\n")

        if images is not None:
            from PIL import Image

            img = (np.clip(np.asarray(images[i]), 0, 1) * 255).astype(np.uint8)
            Image.fromarray(img).save(out / "images" / f"{name}.jpg", quality=98)
    return out


def find_fusibile_output(out_dir) -> Path | None:
    """Locate fusibile's consistencyCheck-*/final3d_model.ply under out_dir."""
    out = Path(out_dir)
    candidates = sorted(out.glob("consistencyCheck*/final3d_model.ply"))
    return candidates[-1] if candidates else None
