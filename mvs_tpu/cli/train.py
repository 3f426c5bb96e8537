"""Training entry point.

    python -m mvs_tpu.cli train --config cfg.yaml [--resume] [key=value ...]

Unifies the reference's five per-pipeline train.py runners (SURVEY.md §2.5):
one loop with task adapters, a device mesh (data parallel by default, depth/
space volume sharding via train.mesh_*), warmup-multistep LR, orbax
checkpointing, JSONL/TensorBoard logging, and per-epoch validation with the
reference's 2/4/8 mm metrics.
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np
import optax

from mvs_tpu.io import dtu as dtu_io
from mvs_tpu.io.pipeline import DataLoader
from mvs_tpu.models.registry import build_model_and_task
from mvs_tpu.parallel import (
    make_mesh, make_view_variance, maybe_initialize_distributed, replicate,
    shard_batch, volume_sharded_plan,
)
from mvs_tpu.train import TrainState, make_train_step, parse_milestones
from mvs_tpu.train.checkpoint import CheckpointManager
from mvs_tpu.train.schedule import warmup_multistep_lr
from mvs_tpu.utils.config import load_config
from mvs_tpu.utils.meters import DictAverageMeter, ScalarLogger

__all__ = ["main", "build_optimizer", "read_scan_list"]


def read_scan_list(path) -> list[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _is_pre_debiased_bn_checkpoint(ckpt) -> bool:
    """True iff the latest checkpoint's batch_stats hold mean/var dicts with
    no 'count' leaf — the pre-debiased-BN on-disk format."""
    try:
        raw = ckpt.restore_raw()
    except Exception:
        return False
    if not isinstance(raw, dict):
        return False
    stats = raw.get("batch_stats")
    found = []

    def walk(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                found.append("count" not in node)
            for v in node.values():
                walk(v)

    walk(stats)
    return bool(found) and any(found)


def _install_numerics_guard():
    """Opt-in NaN tripwire (the reference pins np.seterr(all='raise'),
    CVP-MVSNet/models/modules.py:11): MVS_TPU_DEBUG_NANS=1 makes jax raise on
    any NaN-producing op and the train loop assert a finite loss per
    summary."""
    import os

    on = os.environ.get("MVS_TPU_DEBUG_NANS", "0") == "1"
    if on:
        jax.config.update("jax_debug_nans", True)
    return on


def build_optimizer(cfg, steps_per_epoch: int):
    spec = cfg.train.lr_schedule
    total = cfg.train.epochs * steps_per_epoch
    if spec.startswith("poly"):
        # "poly" or "poly:0.9" (reference MVSNet_pl/opt.py:55-57).
        from mvs_tpu.train.schedule import poly_lr

        exp = float(spec.split(":")[1]) if ":" in spec else 0.9
        schedule = poly_lr(cfg.train.lr, total, poly_exp=exp,
                           warmup_steps=cfg.train.warmup_steps)
    elif spec.startswith("cosine"):
        from mvs_tpu.train.schedule import warmup_cosine_lr

        # optax needs decay_steps (= total, incl. warmup) > warmup_steps.
        warmup = min(cfg.train.warmup_steps, max(total // 10, 1))
        schedule = warmup_cosine_lr(cfg.train.lr, total, warmup_steps=warmup)
    else:
        milestones, gamma = parse_milestones(spec)
        schedule = warmup_multistep_lr(
            cfg.train.lr, [m * steps_per_epoch for m in milestones], gamma,
            warmup_steps=cfg.train.warmup_steps,
        )
    if cfg.train.optimizer == "adam":
        tx = optax.adam(schedule)
    elif cfg.train.optimizer == "rmsprop":
        tx = optax.rmsprop(schedule, decay=0.9)
    elif cfg.train.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    elif cfg.train.optimizer == "radam":
        tx = optax.radam(schedule)
    elif cfg.train.optimizer == "ranger":
        # RAdam + Lookahead (the reference MVSNet_pl Ranger option,
        # utils/optimizers.py).
        tx = optax.lookahead(optax.radam(schedule), sync_period=6,
                             slow_step_size=0.5)
    else:
        raise ValueError(f"unknown optimizer {cfg.train.optimizer}")
    chain = []
    if cfg.train.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.train.grad_clip))
    if cfg.train.weight_decay > 0:
        chain.append(optax.add_decayed_weights(cfg.train.weight_decay))
    chain.append(tx)
    return optax.chain(*chain) if len(chain) > 1 else tx


def _build_mesh(cfg):
    n = len(jax.devices())
    model_axes = (cfg.train.mesh_view * cfg.train.mesh_depth
                  * cfg.train.mesh_space)
    data = cfg.train.mesh_data or max(1, n // model_axes)
    # An explicit mesh smaller than the device count runs on the first
    # data*view*depth*space devices (e.g. debugging a 2-device layout on an
    # 8-device host).
    used = data * model_axes
    return make_mesh(data=data, view=cfg.train.mesh_view,
                     depth=cfg.train.mesh_depth, space=cfg.train.mesh_space,
                     devices=jax.devices()[:used])


def main(argv=None):
    p = argparse.ArgumentParser(prog="mvs_tpu train")
    p.add_argument("--config", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    from mvs_tpu.utils.platform import ensure_platform

    # Multi-host first (the reference's init_process_group slot,
    # CasMVSNet/train.py:297-302): must run before any backend use.
    maybe_initialize_distributed()
    ensure_platform()
    debug_nans = _install_numerics_guard()
    mesh = _build_mesh(cfg)
    plan = volume_sharded_plan(mesh)
    constrained = cfg.model.name in ("mvsnet", "cas_mvsnet")
    model, task, collate_name = build_model_and_task(
        cfg,
        volume_constraint=plan.constrain_volume if constrained else None,
        view_variance=make_view_variance(mesh, getattr(cfg.model, "sampler",
                                                       "gather"))
        if constrained and cfg.train.mesh_view > 1 else None,
    )
    collate = getattr(dtu_io, collate_name)

    train_ds = dtu_io.DTUTrainDataset(
        cfg.data.root, read_scan_list(cfg.data.train_list),
        num_views=cfg.data.num_views, num_depth=cfg.data.num_depth,
        interval_scale=cfg.data.interval_scale,
    )
    val_ds = dtu_io.DTUTrainDataset(
        cfg.data.root, read_scan_list(cfg.data.val_list),
        num_views=cfg.data.num_views, num_depth=cfg.data.num_depth,
        interval_scale=cfg.data.interval_scale, lights=(3,),
    ) if cfg.data.val_list else None

    loader = DataLoader(train_ds, cfg.data.batch_size, collate,
                        num_threads=cfg.data.num_threads, seed=cfg.train.seed)
    steps_per_epoch = len(loader)
    tx = build_optimizer(cfg, steps_per_epoch)

    # Init from one host batch.
    first = next(iter(loader))
    rng = jax.random.key(cfg.train.seed)
    _, (_, variables) = _init_task(task, model, rng, first)

    # Retention keeps the top-k checkpoints by val abs-depth-error when a
    # val split exists (reference MVSNet_pl/train.py:180-183 monitors
    # val/loss; abs error is this repo's val headline metric).
    ckpt = CheckpointManager(
        f"{cfg.train.log_dir}/ckpt",
        best_metric="abs_depth_error" if val_ds is not None else None,
    )
    logger = ScalarLogger(cfg.train.log_dir)

    with jax.set_mesh(mesh):
        state = TrainState.create(
            apply_fn=model.apply,
            params=replicate(mesh, variables["params"]),
            batch_stats=replicate(mesh, variables.get("batch_stats")),
            tx=tx,
        )
        start_epoch = 0
        if args.resume:
            try:
                restored = ckpt.restore(state)
            except Exception as e:
                # Blame the BN schema only when the checkpoint actually
                # predates it (batch_stats with mean/var but no 'count'
                # leaf); other restore failures (corrupt dir, orbax version,
                # disk) re-raise untouched so the real cause stays on top.
                if _is_pre_debiased_bn_checkpoint(ckpt):
                    raise RuntimeError(
                        "--resume found a checkpoint predating the "
                        "debiased-BN batch_stats format (no 'count' leaf). "
                        "Load it via CheckpointManager.restore_raw + "
                        "train.checkpoint.migrate_batch_stats and re-save."
                    ) from e
                raise
            if restored is not None:
                state = restored
                start_epoch = int(state.step) // steps_per_epoch
                print(f"resumed at step {int(state.step)} (epoch {start_epoch})")

        step_fn = make_train_step(task)

        def recal_stats(params, stats, batch):
            # Forward-only train-mode pass: returns refreshed batch_stats.
            return task.loss_and_metrics(params, stats, batch, train=True)[1][0]

        recal_fn = jax.jit(recal_stats)
        for epoch in range(start_epoch, cfg.train.epochs):
            meter = DictAverageMeter()
            t0 = time.time()
            for i, batch in enumerate(loader):
                batch = shard_batch(mesh, batch)
                state, metrics = step_fn(state, batch)
                if (i + 1) % cfg.train.summary_every_steps == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    if debug_nans and not np.isfinite(host["loss"]):
                        raise FloatingPointError(
                            f"non-finite loss {host['loss']} at step "
                            f"{int(state.step)} (MVS_TPU_DEBUG_NANS=1)")
                    meter.update(host)
                    rate = (i + 1) * cfg.data.batch_size / (time.time() - t0)
                    logger.log(int(state.step), host, prefix="train/")
                    print(f"epoch {epoch} step {i + 1}/{steps_per_epoch} "
                          f"loss {host['loss']:.4f} ({rate:.2f} samples/s)")
            logger.log(int(state.step), meter.mean(), prefix="train_epoch/")

            if cfg.train.bn_recal_batches > 0 and state.batch_stats is not None:
                # Opt-in BatchNorm recalibration under the final params (see
                # TrainConfig.bn_recal_batches). Each batch's moments are
                # computed from a FRESH zero-stats tree (one EMA step from
                # zero debias-reads back to exactly that batch's moments),
                # then averaged with EQUAL weights — chaining EMA updates
                # would weight the recal batches geometrically.
                import jax.numpy as jnp

                zero = jax.tree.map(jnp.zeros_like, state.batch_stats)
                acc, n_acc = None, 0
                for i, batch in enumerate(loader):
                    if i >= cfg.train.bn_recal_batches:
                        break
                    s = recal_fn(state.params, zero, shard_batch(mesh, batch))
                    acc = s if acc is None else jax.tree.map(jnp.add, acc, s)
                    n_acc += 1
                if n_acc:
                    state = state.replace(batch_stats=jax.tree.map(
                        lambda a: a / n_acc, acc))

            val_metrics = None
            if val_ds is not None:
                val_loader = DataLoader(val_ds, cfg.data.batch_size, collate,
                                        shuffle=False,
                                        num_threads=cfg.data.num_threads)
                vmeter = DictAverageMeter()
                for bi, batch in enumerate(val_loader):
                    batch = shard_batch(mesh, batch)
                    _, vmetrics = _eval_metrics(task, state, batch)
                    vmeter.update({k: float(v) for k, v in vmetrics.items()})
                    if bi == 0:
                        # est | gt | error panel for the first val batch
                        # (reference MVSNet/utils.py:74-104 image grids).
                        _log_val_images(task, state, batch, logger,
                                        int(state.step))
                val_metrics = vmeter.mean()
                logger.log(int(state.step), val_metrics, prefix="val/")
                print(f"epoch {epoch} val: {val_metrics}")

            if (epoch + 1) % cfg.train.ckpt_every_epochs == 0:
                ckpt.save(int(state.step), state, metrics=val_metrics)
    logger.close()
    ckpt.close()


def _init_task(task, model, rng, batch):
    """Initialize variables by running the task's apply path once."""
    import jax.numpy as jnp

    from mvs_tpu.train.tasks import (
        CascadeTask, MVSNetTask, PointTask, PyramidTask,
    )

    b = {k: v for k, v in batch.items()}
    # jit the init: eager op-by-op initialization of these models is orders
    # of magnitude slower than one compiled program.
    jinit = jax.jit(model.init, static_argnames=("train", "num_depth"))
    if isinstance(task, (MVSNetTask, CascadeTask)):
        variables = jinit(rng, b["imgs"], b["proj_matrices"],
                          b["depth_values"], train=True)
    elif isinstance(task, PyramidTask):
        variables = jinit(rng, b["imgs"], b["intrinsics"], b["extrinsics"],
                          b["depth_min"], b["depth_max"], train=True)
    elif isinstance(task, PointTask):
        variables = jinit(rng, b["imgs"], b["intrinsics"], b["extrinsics"],
                          b["depth_start"], b["depth_interval"],
                          num_depth=task.num_depth, train=True)
    else:
        raise TypeError(type(task))
    return None, (None, variables)


def _summary_triplet(task, out, batch):
    """(depth_est, depth_gt, mask) for sample 0 at matched resolution."""
    import jax

    from mvs_tpu.train.tasks import (
        CascadeTask, MVSNetTask, PointTask, PyramidTask,
    )

    depth = out["depth"]
    if isinstance(task, MVSNetTask):
        return depth[0], batch["depth_gt"][0], batch["mask"][0]
    if isinstance(task, CascadeTask):
        last = f"stage{len(task.stage_weights)}"
        return depth[0], batch["depth_gt"][last][0], batch["mask"][last][0]
    if isinstance(task, PyramidTask):
        return depth[0], batch["depth_gt_levels"][0][0], batch["mask_levels"][0][0]
    if isinstance(task, PointTask):
        gt = jax.image.resize(batch["depth_gt"], depth.shape, method="nearest")
        return depth[0], gt[0], (gt[0] > 0).astype(depth.dtype)
    raise TypeError(type(task))


def _log_val_images(task, state, batch, logger, step):
    """Render the est|gt|error panel for the first val sample. Never fatal:
    visualization must not kill a training run."""
    import numpy as np

    from mvs_tpu.utils.vis import depth_image_summary

    try:
        out, _ = task.forward(state.params, state.batch_stats, batch,
                              train=False)
        est, gt, mask = _summary_triplet(task, out, batch)
        est, gt, mask = (np.asarray(x, np.float32) for x in (est, gt, mask))
        if (mask > 0.5).sum() == 0:
            return
        logger.log_image(step, "val/depth", depth_image_summary(est, gt, mask))
    except Exception as e:  # pragma: no cover - defensive
        print(f"val image summary skipped: {e}")


def _eval_metrics(task, state, batch):
    loss, (_, metrics) = task.loss_and_metrics(
        state.params, state.batch_stats, batch, train=False
    )
    metrics = dict(metrics)
    metrics["loss"] = loss
    return None, metrics


if __name__ == "__main__":
    main()
