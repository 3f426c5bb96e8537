"""Depth-map inference over an eval split.

    python -m mvs_tpu.cli infer --config cfg.yaml --ckpt DIR --out outputs/

Mirrors the reference save_depth stage (CasMVSNet/test.py:147-232): for every
(scan, ref_view) meta, run the model and write depth_est/*.pfm,
confidence/*.pfm, cams/*_cam.txt and images per scan directory — the on-disk
interface the fusion stage consumes.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mvs_tpu.geometry import compose_projection, scale_intrinsics
from mvs_tpu.io import CameraParams, write_cam_file, write_pfm
from mvs_tpu.io.dtu import DTUEvalDataset
from mvs_tpu.models.registry import build_model_and_task
from mvs_tpu.train.checkpoint import CheckpointManager
from mvs_tpu.utils.config import load_config

__all__ = ["main", "run_inference_sample"]


def _model_inputs(cfg, model, sample):
    """Build model args from an eval sample (single item -> batch of 1)."""
    imgs = jnp.asarray(sample["imgs"])[None]
    intr = jnp.asarray(sample["intrinsics"])[None]
    extr = jnp.asarray(sample["extrinsics"])[None]
    name = cfg.model.name
    if name == "mvsnet":
        proj = compose_projection(scale_intrinsics(intr, 0.25), extr)
        return (imgs, proj, jnp.asarray(sample["depth_values"])[None])
    if name == "cas_mvsnet":
        proj = {
            f"stage{i + 1}": compose_projection(scale_intrinsics(intr, s), extr)
            for i, s in enumerate((0.25, 0.5, 1.0))
        }
        return (imgs, proj, jnp.asarray(sample["depth_values"])[None])
    if name in ("cvp_mvsnet", "aacvp_mvsnet"):
        return (imgs, intr, extr, jnp.asarray([sample["depth_min"]]),
                jnp.asarray([sample["depth_max"]]))
    if name == "point_mvsnet":
        return (imgs, intr, extr, jnp.asarray([sample["depth_min"]]),
                jnp.asarray([sample["depth_interval"]]))
    raise ValueError(name)


def run_inference_sample(cfg, model, variables, sample, apply_jit):
    args = _model_inputs(cfg, model, sample)
    out = apply_jit(variables, *args)
    depth = np.asarray(out["depth"][0])
    conf = np.asarray(out["photometric_confidence"][0])
    return depth, conf


def main(argv=None):
    p = argparse.ArgumentParser(prog="mvs_tpu infer")
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default="outputs")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    from mvs_tpu.utils.platform import ensure_platform

    ensure_platform()
    model, task, _ = build_model_and_task(cfg)
    ds = DTUEvalDataset(
        cfg.data.eval_root,
        [s.strip() for s in open(cfg.data.eval_list)] if cfg.data.eval_list
        else sorted(p.name for p in Path(cfg.data.eval_root).iterdir()),
        num_views=cfg.data.num_views, num_depth=cfg.data.num_depth,
        interval_scale=cfg.data.interval_scale,
        max_h=cfg.data.max_h, max_w=cfg.data.max_w, align=cfg.data.align,
    )

    # (Params come entirely from the checkpoint; no full-res init needed —
    # conv parameter shapes are resolution-independent.)
    ckpt = CheckpointManager(args.ckpt)
    restored = ckpt.restore_raw()
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {args.ckpt}")
    # Checkpoints store a full TrainState; inference needs params(+batch_stats).
    variables = {"params": restored["params"]}
    if restored.get("batch_stats") is not None:
        from mvs_tpu.train.checkpoint import migrate_batch_stats

        variables["batch_stats"] = migrate_batch_stats(restored["batch_stats"])

    @jax.jit
    def apply_jit(variables, *margs):
        return model.apply(variables, *margs, train=False)

    out_root = Path(args.out)
    for i in range(len(ds)):
        sample = ds[i]
        depth, conf = run_inference_sample(cfg, model, variables, sample, apply_jit)
        scan_dir = out_root / sample["scan"]
        ref = sample["ref_view"]
        write_pfm(scan_dir / "depth_est" / f"{ref:08d}.pfm", depth)
        write_pfm(scan_dir / "confidence" / f"{ref:08d}.pfm", conf)
        # Write the intrinsics at DEPTH-MAP resolution (MVSNet outputs 1/4
        # res), so the cams/*.txt + depth_est/*.pfm pair is self-consistent
        # for fusion — the reference does the same ÷4 in its eval dataset
        # (MVSNet/eval.py:49-59).
        img_h, img_w = sample["imgs"][0].shape[:2]
        k = np.array(sample["intrinsics"][0], np.float64).copy()
        k[0] *= depth.shape[1] / img_w
        k[1] *= depth.shape[0] / img_h
        cam = CameraParams(
            intrinsics=k.astype(np.float32), extrinsics=sample["extrinsics"][0],
            depth_min=float(sample["depth_min"]),
            depth_interval=float(sample["depth_interval"]),
            num_depth=cfg.data.num_depth, depth_max=float(sample["depth_max"]),
        )
        write_cam_file(scan_dir / "cams" / f"{ref:08d}_cam.txt", cam)
        (scan_dir / "images").mkdir(parents=True, exist_ok=True)
        # jpg, like the reference save_depth stage (CasMVSNet/test.py:189-232)
        # — the format the gipuma bridge and external viewers consume.
        from PIL import Image

        img8 = (np.clip(np.asarray(sample["imgs"][0]), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img8).save(scan_dir / "images" / f"{ref:08d}.jpg",
                                   quality=98)
        print(f"[{i + 1}/{len(ds)}] {sample['scan']} view {ref}: "
              f"depth {depth.shape} conf mean {conf.mean():.3f}")


if __name__ == "__main__":
    main()
