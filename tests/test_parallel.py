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


def _mvsnet_batch(batch_size, num_depth=16):
    from mvs_tpu.geometry import compose_projection, scale_intrinsics

    scenes = [
        make_plane_scene(num_views=3, height=64, width=64, z0=10.0, seed=s)
        for s in range(batch_size)
    ]
    imgs = jnp.asarray(np.stack([s.images for s in scenes]))
    k = scale_intrinsics(jnp.asarray(np.stack([s.intrinsics for s in scenes])), 0.25)
    proj = compose_projection(k, jnp.asarray(np.stack([s.extrinsics for s in scenes])))
    depth_values = jnp.broadcast_to(
        jnp.linspace(8.0, 12.0, num_depth), (batch_size, num_depth))
    gt = jnp.asarray(np.stack([s.depths[0][::4, ::4] for s in scenes]))
    return {
        "imgs": imgs, "proj_matrices": proj, "depth_values": depth_values,
        "depth_gt": gt, "mask": jnp.ones_like(gt),
    }


def test_small_extent_axes_are_not_sharded(caplog):
    """The ShardingPlan guard: 'depth'/'space' are dropped from the spec when
    the regularizer's deepest stride-2 level would underflow.

    Pins a measured XLA GSPMD miscompile (jax 0.9.0 CPU): with a D=16 volume
    sharded depth=2, the U-Net's deepest level is D=2 and encoder conv KERNEL
    gradients come back scaled by exact powers of two (4.000x elementwise on
    the third stride-2 conv; forward pass and decoder grads exact). D>=24
    (deepest >= 3) is clean. Real configs hit the same shapes — CasMVSNet
    stage 3 sweeps D=8 — so constrain_volume must refuse those axes rather
    than rely on callers knowing the rule.
    """
    import logging

    from mvs_tpu.parallel import sharding as sharding_mod

    mesh = make_mesh(data=2, depth=2, space=2)
    plan = volume_sharded_plan(mesh)
    sharding_mod._warned_axes.clear()
    with caplog.at_level(logging.WARNING, logger="mvs_tpu.parallel.sharding"):
        small = plan._guarded(plan.volume_spec, (4, 16, 16, 16, 32))
    assert small == P("data", None, None, None, None), small
    # De-sharding is never silent: the first drop of each axis warns.
    dropped = [r for r in caplog.records if "dropping requested mesh axis" in r.message]
    assert {"'depth'" in r.message or "'space'" in r.message for r in dropped} == {True}
    assert len(dropped) == 2, [r.message for r in dropped]
    ok = plan._guarded(plan.volume_spec, (4, 32, 32, 32, 32))
    assert ok == P("data", "depth", "space", None, None), ok
    # Guard is per-axis, but a failing axis is folded into a dim that can
    # absorb it rather than dropped: D=48 can carry depth*space 4-way
    # (deepest 6 >= 4), so the evicted 'space' axis rides the D dim.
    mixed = plan._guarded(plan.volume_spec, (4, 48, 16, 16, 32))
    assert mixed == P("data", ("depth", "space"), None, None, None), mixed
    # The flagship refine-stage shape: D=8 depth-unshardable, H absorbs the
    # 'depth' axis — all four model-parallel devices stay busy.
    stage3 = plan._guarded(plan.volume_spec, (4, 8, 96, 64, 32))
    assert stage3 == P("data", None, ("space", "depth"), None, None), stage3
    # Scores never enter the stride-2 encoder: guarded at levels=0, so a
    # D=16 score volume stays depth-shardable while the D=16 volume doesn't.
    scores = plan._guarded(plan.depth_spec, (4, 16, 16, 16), levels=0)
    assert scores == P("data", "depth", "space", None), scores


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
        # HIGHEST matmul precision for BOTH runs: the folded convs'
        # legitimate f32 reassociation noise shrinks, so the relative slack
        # in the bound can drop from 5% to 2% (r4 advisor finding — a
        # systematic few-percent DP gradient error must not pass).
        with jax.set_mesh(mesh), jax.default_matmul_precision("highest"):
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
        # Bound = chaos floor + a 5% relative term: data-sharded conv
        # weight-gradients reduce over the batch in per-shard partials +
        # psum, a larger (legitimate) f32 reassociation than the 1-ulp
        # single-device perturbation captures — measured up to ~6x floor
        # (~1-2% of the update norm) on small-gradient leaves with the
        # lane-folded convs. A real DP bug (sum-instead-of-mean grads)
        # deviates by ~7x the update NORM itself, >100x this bound.
        # + tiny absolute term: under HIGHEST the 1-ulp perturbation can
        # produce a literally identical update (floor == 0.0) while GSPMD
        # still reassociates a few ulps; a real bug deviates at ~||upd||
        # scale, orders above 5e-7.
        bound = 3.0 * floor + 0.02 * den + 5e-7
        assert dev <= bound, (
            f"{jax.tree_util.keystr(path)}: DP update deviation {dev:.3e} "
            f"exceeds 3x noise floor {floor:.3e} + 2% (||upd||={den:.3e})")


def test_view_sharded_train_step_matches_single_device():
    """One REAL training step with the source-view axis on the mesh
    (data=2, view=2, depth=2) is FUNCTIONALLY identical to the
    single-device step.

    This exercises the view_variance hook end to end: the model
    materializes the (B, V-1, D, h, w, C) warped stack, GSPMD pins its V
    axis to 'view' and finishes the Σf/Σf² moments with a psum over the
    mesh — the framework's own collective running inside a live train step
    (the reference's nearest analogue is DDP NCCL all-reduce,
    CasMVSNet/train.py:365-372).

    Parity metric: POST-STEP FUNCTION, not raw per-leaf updates. GSPMD's
    per-shard conv algorithms reassociate f32 reductions far beyond 1 ulp,
    and BatchNorm makes whole subspaces of conv-kernel space
    function-degenerate (gauge directions): measured here, the sharded
    update rotates kernels by ~1e-2 relative INSIDE those null directions
    while the updated network's depth output moves by only ~4e-7 relative.
    Real view-axis bugs (a missing psum -> per-shard partial variance
    volumes) change the forward function itself and fail the functional
    check by orders of magnitude; identical-math equivalence of the view
    branch is covered by test_view_sharded_variance_matches_dense above.

    num_depth=32 keeps the 'depth' axis past the ShardingPlan small-extent
    guard, so this step genuinely runs (data, view, depth)-sharded.
    """
    batch = _mvsnet_batch(4, num_depth=32)
    model = MVSNet()
    variables = model.init(
        jax.random.key(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=True,
    )

    def run(mesh, m, b):
        task = MVSNetTask(m)
        with jax.set_mesh(mesh):
            state = TrainState.create(
                apply_fn=m.apply,
                params=replicate(mesh, variables["params"]),
                batch_stats=replicate(mesh, variables["batch_stats"]),
                tx=optax.sgd(1e-2),
            )
            sb = shard_batch(mesh, b)
            step = make_train_step(task, donate=False)
            new_state, metrics = step(state, sb)
            return float(metrics["loss"]), jax.device_get(new_state.params)

    mesh = make_mesh(data=2, view=2, depth=2)
    plan = volume_sharded_plan(mesh)
    from mvs_tpu.parallel import make_view_variance
    sharded_model = MVSNet(volume_constraint=plan.constrain_volume,
                           view_variance=make_view_variance(mesh))
    single = make_mesh(data=1, devices=jax.devices()[:1])

    loss_v, params_v = run(mesh, sharded_model, batch)
    loss_1, params_1 = run(single, model, batch)
    assert loss_v == pytest.approx(loss_1, rel=1e-4)

    # The two updated parameter sets must implement the same function.
    def depth_of(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
            train=False,
        )
        return np.asarray(out["depth"])

    d_v, d_1 = depth_of(params_v), depth_of(params_1)
    scale = np.abs(d_1).mean()
    assert np.abs(d_v - d_1).max() <= 1e-4 * scale, (
        np.abs(d_v - d_1).max(), scale)

    # Magnitude sanity: catches sum-instead-of-mean style scaling bugs that
    # functional checks at tiny lr could understate. Per-leaf ratios are only
    # meaningful for leaves carrying real update mass — tiny-gradient leaves
    # (e.g. the feature net's final conv bias, which the variance volume is
    # *nearly* invariant to) are noise-dominated and excluded; the global
    # norm ratio covers them in aggregate.
    leaf_norms = []
    for path, p_v in jax.tree_util.tree_flatten_with_path(params_v)[0]:
        p_1, p_0 = params_1, variables["params"]
        for k in path:
            p_1 = p_1[k.key]
            p_0 = p_0[k.key]
        n_v = np.linalg.norm(p_v - np.asarray(p_0))
        n_1 = np.linalg.norm(np.asarray(p_1) - np.asarray(p_0))
        leaf_norms.append((jax.tree_util.keystr(path), n_v, n_1))
    g_v = np.sqrt(sum(n_v**2 for _, n_v, _ in leaf_norms))
    g_1 = np.sqrt(sum(n_1**2 for _, _, n_1 in leaf_norms))
    assert 0.7 <= g_v / g_1 <= 1.4, (g_v, g_1)
    # A scaling bug multiplies EVERY leaf's update by the same factor, so
    # assert on the population of ratios, not each leaf: individual leaves
    # (e.g. the first conv kernel, whose update is dominated by BN gauge
    # directions the function is invariant to) legitimately drift outside
    # [0.5, 2] under sharded-conv reassociation while the function check
    # above stays at ~1e-7 relative.
    big = max(n_1 for _, _, n_1 in leaf_norms)
    ratios = [n_v / n_1 for _, n_v, n_1 in leaf_norms if n_1 > 0.05 * big]
    med = float(np.median(ratios))
    assert 0.7 <= med <= 1.4, (med, sorted(ratios))
    frac_ok = np.mean([0.5 <= r <= 2.0 for r in ratios])
    assert frac_ok >= 0.8, (frac_ok, sorted(ratios))


def test_volume_sharded_forward_matches_dense():
    """Depth/space-sharded cost volume produces the same depths as unsharded.

    num_depth=32 so the guard (test_small_extent_axes_are_not_sharded) keeps
    the 'depth' axis ON the mesh: deepest U-Net level D=4 >= max(3, 2)."""
    batch = _mvsnet_batch(2, num_depth=32)
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
