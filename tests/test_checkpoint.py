"""Checkpoint format migration + resume-path diagnostics.

The current Norm/FusedConvBlock3D BN scheme stores zero-init EMA accumulators
plus a 'count' scalar, debiased at read (nn/blocks.py). Pre-debiased-BN
checkpoints stored plain converged EMA mean/var with no 'count'.
migrate_batch_stats must make such checkpoints read back the SAME eval
statistics (reference analogue: the prefix-filtered partial ckpt loader,
MVSNet_pl/utils/__init__.py:52-80, and utils/ckpt_transfer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvs_tpu.nn.blocks import ConvBlock
from mvs_tpu.train.checkpoint import CheckpointManager, migrate_batch_stats


def _trained_convblock(steps=5):
    """A ConvBlock with a few BN updates so the running stats are non-trivial."""
    model = ConvBlock(8, (3, 3))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, True)
    params, stats = variables["params"], variables["batch_stats"]
    for i in range(steps):
        xi = jnp.asarray(
            rng.standard_normal((2, 16, 16, 3)).astype(np.float32)) * (1 + i)
        _, upd = model.apply({"params": params, "batch_stats": stats}, xi,
                             True, mutable=["batch_stats"])
        stats = upd["batch_stats"]
    return model, params, stats, x


def _to_old_format(stats):
    """Collapse debiased accumulators to the legacy plain-EMA layout: the
    debiased read values stored directly, no 'count' leaf."""
    def walk(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node and "count" in node:
                denom = 1.0 - np.power(0.9, float(node["count"]))
                return {"mean": np.asarray(node["mean"]) / denom,
                        "var": np.asarray(node["var"]) / denom}
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(jax.device_get(stats))


def test_migrate_batch_stats_eval_parity(tmp_path):
    """Old-format checkpoint -> restore_raw -> migrate -> eval outputs match
    a never-migrated run exactly (the assumed_count debias denominator is 1
    to f32 precision, so stored EMAs pass through unchanged)."""
    model, params, stats, x = _trained_convblock()
    ref_out = model.apply({"params": params, "batch_stats": stats}, x, False)

    old_state = {"params": jax.device_get(params),
                 "batch_stats": _to_old_format(stats)}
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(0, old_state)
    raw = mgr.restore_raw()
    mgr.close()
    assert "count" not in jax.tree.leaves(
        {k: list(v) for k, v in raw["batch_stats"].items()
         if isinstance(v, dict)}), "fixture must be old-format"

    migrated = migrate_batch_stats(raw["batch_stats"])
    # Every BN dict now carries a synthesized count leaf.
    def counts(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                yield node.get("count")
            for v in node.values():
                yield from counts(v)
    cs = list(counts(migrated))
    assert cs and all(c is not None for c in cs)

    out = model.apply({"params": raw["params"], "batch_stats": migrated},
                      x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-6, atol=1e-6)


def test_migrate_batch_stats_is_noop_on_current_format():
    _, _, stats, _ = _trained_convblock(steps=2)
    host = jax.device_get(stats)
    migrated = migrate_batch_stats(host)
    assert jax.tree.structure(migrated) == jax.tree.structure(host)
    for a, b in zip(jax.tree.leaves(migrated), jax.tree.leaves(host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pre_debiased_bn_checkpoint_detection(tmp_path):
    """cli.train blames the BN schema only for genuinely old checkpoints."""
    from mvs_tpu.cli.train import _is_pre_debiased_bn_checkpoint

    _, params, stats, _ = _trained_convblock(steps=1)
    old = CheckpointManager(tmp_path / "old")
    old.save(0, {"params": jax.device_get(params),
                 "batch_stats": _to_old_format(stats)})
    assert _is_pre_debiased_bn_checkpoint(old)
    old.close()

    new = CheckpointManager(tmp_path / "new")
    new.save(0, {"params": jax.device_get(params),
                 "batch_stats": jax.device_get(stats)})
    assert not _is_pre_debiased_bn_checkpoint(new)
    new.close()

    empty = CheckpointManager(tmp_path / "empty")
    assert not _is_pre_debiased_bn_checkpoint(empty)
    empty.close()


def test_best_metric_retention(tmp_path):
    """best_metric retention keeps the top-k checkpoints by val metric and
    best_step() points at the minimum (reference MVSNet_pl/train.py:180-183
    ModelCheckpoint(monitor='val/loss') + PointMVSNet Checkpointer)."""
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2,
                            best_metric="abs_depth_error", best_mode="min")
    state = {"w": np.arange(4, dtype=np.float32)}
    errs = {10: 3.0, 20: 1.0, 30: 2.0, 40: 5.0}
    for step, err in errs.items():
        mgr.save(step, state, metrics={"abs_depth_error": err})
    assert mgr.best_step() == 20
    # Retention keeps the 2 best by metric: steps 20 (1.0) and 30 (2.0).
    kept = set(mgr._mgr.all_steps())
    assert kept == {20, 30}, kept
    restored = mgr.restore({"w": np.zeros(4, np.float32)}, step=20)
    np.testing.assert_allclose(restored["w"], state["w"])
    mgr.close()


def test_best_step_readable_by_fresh_manager(tmp_path):
    """--step best contract: a NEW manager over the same directory (with the
    metric configured) ranks the persisted per-step metrics."""
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=3,
                            best_metric="abs_depth_error")
    for step, err in ((1, 2.0), (2, 0.5), (3, 1.0)):
        mgr.save(step, {"w": np.ones(2, np.float32)},
                 metrics={"abs_depth_error": err})
    mgr.close()
    fresh = CheckpointManager(tmp_path / "ck", best_metric="abs_depth_error")
    assert fresh.best_step() == 2
    fresh.close()
