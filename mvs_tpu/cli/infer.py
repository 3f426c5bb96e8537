"""Depth-map inference over an eval split — batched, compiled once.

    python -m mvs_tpu.cli infer --config cfg.yaml --ckpt DIR --out outputs/

Mirrors the reference save_depth stage (CasMVSNet/test.py:147-232): for every
(scan, ref_view) meta, run the model and write depth_est/*.pfm,
confidence/*.pfm, cams/*_cam.txt and images per scan directory — the on-disk
interface the fusion stage consumes.

Unlike the reference's per-sample loop, samples are grouped into SHAPE
BUCKETS (images are rescaled/aligned per scene, general_eval.py:92-109, so a
split usually has one bucket) and run through ONE jitted program at
``data.batch_size`` refs per step; ragged tails are padded by repeating the
last sample and the padded outputs dropped. bench.py measures this same
``make_apply_fn`` program, so the benchmarked path IS the product path.
"""

from __future__ import annotations

import argparse
import time
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

__all__ = ["main", "make_apply_fn", "stack_model_inputs",
           "run_batched_inference"]


def stack_model_inputs(cfg, samples):
    """Stack N same-shaped eval samples into one batch of model args."""
    imgs = jnp.asarray(np.stack([s["imgs"] for s in samples]))
    intr = jnp.asarray(np.stack([s["intrinsics"] for s in samples]))
    extr = jnp.asarray(np.stack([s["extrinsics"] for s in samples]))
    name = cfg.model.name
    if name == "mvsnet":
        proj = compose_projection(scale_intrinsics(intr, 0.25), extr)
        dv = jnp.asarray(np.stack([s["depth_values"] for s in samples]))
        return (imgs, proj, dv)
    if name == "cas_mvsnet":
        proj = {
            f"stage{i + 1}": compose_projection(scale_intrinsics(intr, s), extr)
            for i, s in enumerate((0.25, 0.5, 1.0))
        }
        dv = jnp.asarray(np.stack([s["depth_values"] for s in samples]))
        return (imgs, proj, dv)
    if name in ("cvp_mvsnet", "aacvp_mvsnet"):
        return (imgs, intr, extr,
                jnp.asarray([s["depth_min"] for s in samples]),
                jnp.asarray([s["depth_max"] for s in samples]))
    if name == "point_mvsnet":
        return (imgs, intr, extr,
                jnp.asarray([s["depth_min"] for s in samples]),
                jnp.asarray([s["depth_interval"] for s in samples]))
    raise ValueError(name)


def make_apply_fn(model, **static_kwargs):
    """The single compiled inference program (shared with bench.py).

    static_kwargs: model-specific static call args (e.g. PointMVSNet's
    num_depth / use_flow — use model_static_kwargs(cfg))."""

    @jax.jit
    def apply_jit(variables, *margs):
        out = model.apply(variables, *margs, train=False, **static_kwargs)
        # PointMVSNet's confidence analogue is the coarse 2-tap probability
        # map (the reference's probability_filter input,
        # PointMVSNet/depthfusion.py:153).
        conf = out.get("photometric_confidence", out.get("coarse_prob_map"))
        return out["depth"], conf

    return apply_jit


def model_static_kwargs(cfg) -> dict:
    """Static forward-call kwargs per model family (beyond the tensor args
    stack_model_inputs builds)."""
    if cfg.model.name == "point_mvsnet":
        return {"num_depth": cfg.model.num_depth_coarse}
    return {}


def run_batched_inference(cfg, model, variables, samples_iter, batch_size,
                          apply_fn=None):
    """Yield (sample, depth, conf) over an iterable of eval samples.

    Samples are grouped by image-stack shape; each full bucket batch runs
    through one jitted program. Ragged tails are padded by repeating the
    last sample (padded outputs are discarded). Compiles once per distinct
    (shape, tail-pad) — in practice once per split.
    """
    apply_fn = apply_fn or make_apply_fn(model, **model_static_kwargs(cfg))
    pending: dict[tuple, list] = {}

    def flush(bucket):
        batch = pending.pop(bucket)
        n = len(batch)
        padded = batch + [batch[-1]] * (batch_size - n)
        args = stack_model_inputs(cfg, padded)
        depth, conf = apply_fn(variables, *args)
        depth = np.asarray(depth)
        conf = np.asarray(conf)
        for j, s in enumerate(batch):
            yield s, depth[j], conf[j]

    for sample in samples_iter:
        key = np.asarray(sample["imgs"]).shape
        pending.setdefault(key, []).append(sample)
        if len(pending[key]) == batch_size:
            yield from flush(key)
    for key in list(pending):
        yield from flush(key)


def main(argv=None):
    p = argparse.ArgumentParser(prog="mvs_tpu infer")
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default="outputs")
    p.add_argument("--step", default="latest",
                   help="latest | best (top val abs-depth-error, needs a "
                        "best-metric checkpoint manager) | <int>")
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
    # best_metric lets a fresh manager rank the saved per-step metrics
    # (orbax persists them in step metadata) for --step best.
    ckpt = CheckpointManager(args.ckpt, best_metric="abs_depth_error")
    step = None
    if args.step == "best":
        step = ckpt.best_step()  # None -> falls back to latest
        if step is not None:
            print(f"using best checkpoint (step {step})")
    elif args.step != "latest":
        step = int(args.step)
    restored = ckpt.restore_raw(step)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {args.ckpt}")
    # Checkpoints store a full TrainState; inference needs params(+batch_stats).
    variables = {"params": restored["params"]}
    if restored.get("batch_stats") is not None:
        from mvs_tpu.train.checkpoint import migrate_batch_stats

        variables["batch_stats"] = migrate_batch_stats(restored["batch_stats"])

    out_root = Path(args.out)
    total = len(ds)
    batch_size = max(1, cfg.data.batch_size)
    t0 = time.perf_counter()
    done = 0
    for sample, depth, conf in run_batched_inference(
        cfg, model, variables, (ds[i] for i in range(total)), batch_size
    ):
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
        done += 1
        print(f"[{done}/{total}] {sample['scan']} view {ref}: "
              f"depth {depth.shape} conf mean {conf.mean():.3f}")
    dt = time.perf_counter() - t0
    print(f"inference: {total} depth maps in {dt:.1f}s "
          f"({total / dt:.2f} maps/s, batch {batch_size})")


if __name__ == "__main__":
    main()
