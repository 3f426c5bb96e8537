"""Subprocess worker: 16-device virtual mesh with ALL FOUR axes > 1.

Run by tests/test_mesh16.py. Builds mesh (data=2, view=2, depth=2, space=2),
runs one CasMVSNet train step at stage-realistic depth counts, and checks the
loss + updated params against the identical step on a single device.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 16)

import numpy as np  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, sys.argv[1])

from __graft_entry__ import _example_batch  # noqa: E402
from mvs_tpu.models.cas_mvsnet import CasMVSNet  # noqa: E402
from mvs_tpu.parallel import (  # noqa: E402
    make_mesh, make_view_variance, replicate, shard_batch,
    volume_sharded_plan,
)
from mvs_tpu.train import CascadeTask, TrainState, make_train_step  # noqa: E402


def run_step(mesh, plan, batch, variables, view_sharded):
    model = CasMVSNet(
        ndepths=(48, 32, 8),
        volume_constraint=plan.constrain_volume if plan else None,
        view_variance=make_view_variance(mesh) if (plan and view_sharded)
        else None,
    )
    task = CascadeTask(model)
    with jax.set_mesh(mesh):
        state = TrainState.create(
            apply_fn=model.apply,
            params=replicate(mesh, variables["params"]),
            batch_stats=replicate(mesh, variables.get("batch_stats")),
            tx=optax.sgd(1e-3),
        )
        sb = shard_batch(mesh, batch)
        step = make_train_step(task)
        state, metrics = step(state, sb)
        loss = float(metrics["loss"])
        params = jax.device_get(state.params)
    return loss, params


def main():
    assert jax.device_count() == 16, jax.devices()
    batch = _example_batch(batch_size=2, height=96, width=64, num_depth=48)

    init_model = CasMVSNet(ndepths=(48, 32, 8))
    variables = jax.jit(init_model.init, static_argnames=("train",))(
        jax.random.key(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=True,
    )
    # Host copy: device_put onto a mesh that contains the source device can
    # alias the buffer, and the train step's donation would delete it out
    # from under the second run.
    variables = jax.device_get(variables)

    mesh16 = make_mesh(data=2, view=2, depth=2, space=2)
    plan = volume_sharded_plan(mesh16)
    loss16, p16 = run_step(mesh16, plan, batch, variables, view_sharded=True)

    mesh1 = make_mesh(data=1, devices=jax.devices()[:1])
    loss1, p1 = run_step(mesh1, None, batch, variables, view_sharded=False)

    assert np.isfinite(loss16) and np.isfinite(loss1)
    rel = abs(loss16 - loss1) / max(abs(loss1), 1e-8)
    assert rel < 2e-2, (loss16, loss1, rel)

    # Parameter-update parity, leaf-norm-ratio form (same methodology as
    # tests/test_parallel.py's view-sharded check): the gradient of a
    # randomly-initialized ReLU+BatchNorm net is ill-conditioned, so
    # individual leaves legitimately drift under sharded-conv reassociation
    # while the function value stays at ~1e-7 relative; a real bug (sum vs
    # mean, missing psum) scales EVERY leaf by the same factor, which the
    # median/total-norm checks catch.
    flat16 = jax.tree_util.tree_leaves(p16)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat0 = jax.tree_util.tree_leaves(jax.device_get(variables["params"]))
    upd16 = [np.linalg.norm(a - c) for a, c in zip(flat16, flat0)]
    upd1 = [np.linalg.norm(b - c) for b, c in zip(flat1, flat0)]
    g16 = np.sqrt(sum(u ** 2 for u in upd16))
    g1 = np.sqrt(sum(u ** 2 for u in upd1))
    assert 0.7 <= g16 / g1 <= 1.4, (g16, g1)
    big = max(upd1)
    ratios = [a / b for a, b in zip(upd16, upd1) if b > 0.05 * big]
    med = float(np.median(ratios))
    assert 0.7 <= med <= 1.4, (med, sorted(ratios))
    frac_ok = np.mean([0.5 <= r <= 2.0 for r in ratios])
    assert frac_ok >= 0.8, (frac_ok, sorted(ratios))
    rel_upd = abs(g16 / g1 - 1.0)

    from mvs_tpu.parallel import sharding as sharding_mod

    # The guard must have FOLDED (not dropped) the depth axis at stage 3.
    assert not sharding_mod._warned_axes, sharding_mod._warned_axes
    print(f"MESH16_OK loss16={loss16:.6f} loss1={loss1:.6f} "
          f"rel_upd={rel_upd:.4f} folded={sorted(sharding_mod._folded_axes)}")


if __name__ == "__main__":
    main()
