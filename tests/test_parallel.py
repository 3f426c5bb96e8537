import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from mvs_tpu.geometry import relative_projection, uniform_depth_values
from mvs_tpu.models import MVSNet
from mvs_tpu.ops import variance_cost_volume
from mvs_tpu.parallel import (
    data_parallel_mesh, make_mesh, psum_metrics, replicate, shard_batch,
    view_sharded_variance_volume, volume_sharded_plan,
)
from mvs_tpu.train import MVSNetTask, TrainState, make_train_step
from mvs_tpu.utils.synthetic import make_plane_scene


def test_make_mesh_axes():
    mesh = make_mesh(data=2, view=2, depth=2, space=1)
    assert mesh.axis_names == ("data", "view", "depth", "space")
    assert mesh.shape["data"] == 2
    with pytest.raises(ValueError):
        make_mesh(data=3, view=3)


def test_view_sharded_variance_matches_dense():
    """View-axis sharding with psum == single-device variance volume."""
    scene = make_plane_scene(num_views=5, height=32, width=32, z0=10.0)
    feats = jnp.asarray(scene.images)  # use images as stand-in features
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[v], proj[0]) for v in range(1, 5)])
    depths = uniform_depth_values(8.0, 0.5, 8)

    dense = variance_cost_volume(feats[0], feats[1:], rels, depths)

    mesh = make_mesh(view=4, data=1, depth=1, space=2)
    sharded = view_sharded_variance_volume(
        mesh, feats[0], feats[1:], rels, depths
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_psum_metrics_mean():
    mesh = data_parallel_mesh()
    from jax import shard_map

    vals = jnp.arange(8, dtype=jnp.float32)

    out = shard_map(
        lambda v: psum_metrics({"m": v.sum()}, "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
        check_vma=False,
    )(vals)
    assert float(out["m"]) == pytest.approx(np.arange(8).mean())


def _mvsnet_batch(batch_size):
    from mvs_tpu.geometry import compose_projection, scale_intrinsics

    scenes = [
        make_plane_scene(num_views=3, height=64, width=64, z0=10.0, seed=s)
        for s in range(batch_size)
    ]
    imgs = jnp.asarray(np.stack([s.images for s in scenes]))
    k = scale_intrinsics(jnp.asarray(np.stack([s.intrinsics for s in scenes])), 0.25)
    proj = compose_projection(k, jnp.asarray(np.stack([s.extrinsics for s in scenes])))
    depth_values = jnp.broadcast_to(jnp.linspace(8.0, 12.0, 16), (batch_size, 16))
    gt = jnp.asarray(np.stack([s.depths[0][::4, ::4] for s in scenes]))
    return {
        "imgs": imgs, "proj_matrices": proj, "depth_values": depth_values,
        "depth_gt": gt, "mask": jnp.ones_like(gt),
    }


def test_data_parallel_train_step_matches_single_device():
    """The same batch through a 1-device and an 8-device mesh gives the same
    loss and the same parameter update (GSPMD DP == serial compute), up to a
    SELF-CALIBRATED numerical noise floor.

    Why not a fixed tight tolerance: the gradient of a randomly-initialized
    ReLU+BatchNorm network is numerically ill-conditioned — measured here, a
    1-ulp relative scaling of the input images (a near-exact no-op under
    BatchNorm's scale invariance) moves the first conv layer's gradient by
    ~0.4 relative L2, via ReLU gate flips and BN rsqrt amplification of f32
    rounding. GSPMD's re-association of the batch reductions perturbs
    intermediates at the same ~1-ulp level, so its deviation cannot be
    bounded below that conditioning noise.

    So the test measures the noise floor in situ: per leaf, the DP-vs-single
    update deviation must not exceed 3x the deviation induced by the 1-ulp
    input perturbation on a single device. Real DP bugs are far above this:
    sum-instead-of-mean gradients deviate by ~7x the update norm, a missing
    psum deviates O(1) on every leaf including well-conditioned deep biases
    whose measured noise floor is tiny. The DDP contract being verified is
    reference CasMVSNet/train.py:365-372. Loss parity stays tight (the
    forward pass is continuous, hence well-conditioned).
    """
    batch = _mvsnet_batch(8)
    model = MVSNet()
    variables = model.init(
        jax.random.key(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=True,
    )
    task = MVSNetTask(model)

    def run(mesh, b):
        with jax.set_mesh(mesh):
            state = TrainState.create(
                apply_fn=model.apply,
                params=replicate(mesh, variables["params"]),
                batch_stats=replicate(mesh, variables["batch_stats"]),
                tx=optax.sgd(1e-2),
            )
            sb = shard_batch(mesh, b)
            step = make_train_step(task, donate=False)
            new_state, metrics = step(state, sb)
            updates = jax.tree.map(
                lambda a, b2: np.asarray(a - b2),
                new_state.params, variables["params"],
            )
            return float(metrics["loss"]), updates

    single = make_mesh(data=1, devices=jax.devices()[:1])
    loss_dp, upd_dp = run(data_parallel_mesh(), batch)
    loss_1, upd_1 = run(single, batch)
    # Noise-floor calibration: identical math, 1-ulp input perturbation.
    perturbed = dict(batch)
    perturbed["imgs"] = batch["imgs"] * (1.0 + 2e-7)
    _, upd_noise = run(single, perturbed)

    assert loss_dp == pytest.approx(loss_1, rel=1e-4)
    for path, u_dp in jax.tree_util.tree_flatten_with_path(upd_dp)[0]:
        u_1, u_n = upd_1, upd_noise
        for k in path:
            u_1 = u_1[k.key]
            u_n = u_n[k.key]
        dev = np.linalg.norm(u_dp - u_1)
        floor = np.linalg.norm(u_n - u_1)
        den = np.linalg.norm(u_1)
        bound = 3.0 * floor + 1e-6 * den + 1e-12
        assert dev <= bound, (
            f"{jax.tree_util.keystr(path)}: DP update deviation {dev:.3e} "
            f"exceeds 3x measured noise floor {floor:.3e} (||upd||={den:.3e})")


def test_volume_sharded_forward_matches_dense():
    """Depth/space-sharded cost volume produces the same depths as unsharded."""
    batch = _mvsnet_batch(2)
    mesh = make_mesh(data=2, depth=2, space=2)
    plan = volume_sharded_plan(mesh)

    model_dense = MVSNet()
    variables = model_dense.init(
        jax.random.key(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=False,
    )
    out_dense = model_dense.apply(
        variables, batch["imgs"], batch["proj_matrices"], batch["depth_values"]
    )

    model_sharded = MVSNet(volume_constraint=plan.constrain_volume)
    with jax.set_mesh(mesh):
        sb = shard_batch(mesh, batch)
        out_sharded = jax.jit(
            lambda v, b: model_sharded.apply(
                v, b["imgs"], b["proj_matrices"], b["depth_values"]
            )
        )(replicate(mesh, variables), sb)
    np.testing.assert_allclose(
        np.asarray(out_sharded["depth"]), np.asarray(out_dense["depth"]),
        rtol=1e-3, atol=1e-3,
    )


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == 1
    ge.dryrun_multichip(8)
