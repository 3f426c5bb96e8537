import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mvs_tpu.models.point_mvsnet import PointMVSNet
from mvs_tpu.ops.point_ops import (
    fetch_point_features, gather_neighbors, lattice_knn, point_pixel_grid,
)
from mvs_tpu.train.losses import point_mvsnet_loss
from mvs_tpu.utils.synthetic import make_plane_scene


def test_fetch_point_features_projection():
    """A world point projecting to a known pixel fetches that pixel's feature."""
    scene = make_plane_scene(num_views=2, height=32, width=32, z0=10.0,
                             jitter_angle=0.0)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 32, 32, 4)).astype(np.float32))
    # Pixel-centre (10.5, 20.5) of the ref view at depth 10 (identity extrinsics).
    k_inv = np.linalg.inv(scene.intrinsics[0])
    pt = (k_inv @ np.array([10.5, 20.5, 1.0])) * 10.0
    out = fetch_point_features(
        feats, jnp.asarray(pt[:, None], dtype=jnp.float32),
        jnp.asarray(scene.intrinsics), jnp.asarray(scene.extrinsics),
    )
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(feats[0, 20, 10]),
                               rtol=1e-4, atol=1e-4)


def test_point_pixel_grid_centres():
    g = np.asarray(point_pixel_grid(2, 3))
    np.testing.assert_allclose(g[0, :3], [0.5, 1.5, 2.5])
    np.testing.assert_allclose(g[1, [0, 3]], [0.5, 1.5])


def test_lattice_knn_nearest_is_self():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.standard_normal((3, 5, 6, 6)).astype(np.float32))
    idx = lattice_knn(xyz, kernel_size=3, k=4)
    assert idx.shape == (5 * 6 * 6, 4)
    # Self (distance 0) must always be among the neighbours.
    self_idx = np.arange(5 * 6 * 6)
    assert (np.asarray(idx) == self_idx[:, None]).any(axis=1).all()


def test_gather_neighbors():
    feats = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    idx = jnp.asarray([[0, 1], [2, 3], [4, 5], [0, 0], [1, 1], [5, 4]])
    out = np.asarray(gather_neighbors(feats, idx))
    np.testing.assert_array_equal(out[1, 0], [4, 5])
    np.testing.assert_array_equal(out[5, 1], [8, 9])


@pytest.fixture(scope="module")
def point_batch():
    scene = make_plane_scene(num_views=3, height=64, width=64, z0=10.0)
    imgs = jnp.asarray(scene.images)[None]
    intr = jnp.asarray(scene.intrinsics)[None]
    extr = jnp.asarray(scene.extrinsics)[None]
    depth_start = jnp.asarray([8.0])
    depth_interval = jnp.asarray([4.0 / 15])
    gt = jnp.asarray(scene.depths[0])[None]
    return imgs, intr, extr, depth_start, depth_interval, gt


def test_point_mvsnet_coarse_only(point_batch):
    imgs, intr, extr, ds, di, _ = point_batch
    model = PointMVSNet()
    params = model.init(jax.random.key(0), imgs, intr, extr, ds, di,
                        num_depth=16, use_flow=False)
    out = model.apply(params, imgs, intr, extr, ds, di,
                      num_depth=16, use_flow=False)
    assert out["coarse_depth"].shape == (1, 8, 8)
    assert out["coarse_prob_map"].shape == (1, 8, 8)
    d = np.asarray(out["coarse_depth"])
    assert np.isfinite(d).all()
    assert d.min() > 7.0 and d.max() < 13.0


def test_point_mvsnet_flow_forward(point_batch):
    imgs, intr, extr, ds, di, _ = point_batch
    model = PointMVSNet(flow_scales=(0.125, 0.25), inter_scales=(0.75, 0.375))
    params = model.init(jax.random.key(0), imgs, intr, extr, ds, di,
                        num_depth=16, use_flow=True)
    out = model.apply(params, imgs, intr, extr, ds, di,
                      num_depth=16, use_flow=True)
    assert out["flow1"].shape == (1, 8, 8)
    assert out["flow2"].shape == (1, 16, 16)
    assert out["depth"].shape == (1, 16, 16)
    assert out["flow1_prob"].shape == (1, 5, 8, 8)
    assert np.isfinite(np.asarray(out["depth"])).all()
    # Flow refinement can move depth at most 2 intervals per iteration.
    delta = np.abs(np.asarray(out["flow1"]) - np.asarray(out["coarse_depth"]))
    assert delta.max() <= 2 * float(di[0]) * 0.75 + 1e-5


def test_point_mvsnet_tiled_subflow_matches_untiled(point_batch):
    """Test-time tiled sub-flow (reference PointMVSNet/pointmvsnet/
    model.py:231-267): stride-2 interleaved sub-lattices produce nearly the
    depth map of the untiled flow. Exact equality is not expected — the kNN
    graph of a sub-lattice differs at sub-grid seams — but residuals must be
    a small fraction of the hypothesis interval."""
    imgs, intr, extr, ds, di, _ = point_batch
    kw = dict(flow_scales=(0.25, 0.5), inter_scales=(0.75, 0.375))
    model = PointMVSNet(**kw)
    params = model.init(jax.random.key(0), imgs, intr, extr, ds, di,
                        num_depth=16, use_flow=True)
    out_full = model.apply(params, imgs, intr, extr, ds, di,
                           num_depth=16, use_flow=True)
    tiled = PointMVSNet(flow_sub_stride=2, **kw)
    out_tiled = tiled.apply(params, imgs, intr, extr, ds, di,
                            num_depth=16, use_flow=True)
    assert out_tiled["depth"].shape == out_full["depth"].shape == (1, 32, 32)
    diff = np.abs(np.asarray(out_tiled["depth"]) - np.asarray(out_full["depth"]))
    # Residual budget: well under one final-iteration hypothesis step.
    step = float(di[0]) * 0.375
    assert diff.mean() < 0.15 * step, (diff.mean(), step)
    assert np.isfinite(np.asarray(out_tiled["depth"])).all()


def test_point_mvsnet_full_res_tiled_inference():
    """A full-resolution flow inference fits and runs when tiled (stride 4):
    the memory-bounding contract of the reference's test-time sub-flow."""
    scene = make_plane_scene(num_views=3, height=256, width=320, z0=10.0)
    imgs = jnp.asarray(scene.images)[None]
    intr = jnp.asarray(scene.intrinsics)[None]
    extr = jnp.asarray(scene.extrinsics)[None]
    ds, di = jnp.asarray([8.0]), jnp.asarray([4.0 / 15])
    model = PointMVSNet(flow_scales=(0.25, 0.5), inter_scales=(0.75, 0.375),
                        flow_sub_stride=4)
    params = model.init(jax.random.key(0), imgs, intr, extr, ds, di,
                        num_depth=16, use_flow=False)
    out = jax.jit(
        lambda p: model.apply(p, imgs, intr, extr, ds, di,
                              num_depth=16, use_flow=True)
    )(params)
    assert out["depth"].shape == (1, 128, 160)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_point_mvsnet_staged_coarse_then_flow_training(point_batch):
    """Reference workflow: train coarse-only for INIT_EPOCHs, then enable
    PointFlow on the *same* weights (PointMVSNet/pointmvsnet/train.py:218 —
    torch modules own all params regardless of isFlow). A coarse-only init
    must therefore create the flow params, and training must continue
    seamlessly when the flow is switched on."""
    imgs, intr, extr, ds, di, gt = point_batch
    model = PointMVSNet(flow_scales=(0.125, 0.25), inter_scales=(0.75, 0.375))
    variables = model.init(jax.random.key(2), imgs, intr, extr, ds, di,
                           num_depth=16, use_flow=False, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    # Flow-branch params exist even though init never ran the flow.
    for name in ("flow_img_conv", "edge_conv0", "edge_conv1", "edge_conv2",
                 "flow_mlp", "flow_head"):
        assert name in params, sorted(params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def make_step(use_flow):
        @jax.jit
        def step(params, batch_stats, opt_state):
            def loss_fn(p):
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    imgs, intr, extr, ds, di, num_depth=16, use_flow=use_flow,
                    train=True, mutable=["batch_stats"],
                )
                total, _ = point_mvsnet_loss(out, gt, di)
                return total, updates

            (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            pu, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, pu), updates["batch_stats"],
                    opt_state, loss)
        return step

    coarse_step, flow_step = make_step(False), make_step(True)
    for _ in range(3):
        params, batch_stats, opt_state, loss = coarse_step(
            params, batch_stats, opt_state)
        assert np.isfinite(float(loss))
    flow_params_before = jax.tree.map(lambda x: x.copy(), params["flow_head"])
    losses = []
    for _ in range(5):
        params, batch_stats, opt_state, loss = flow_step(
            params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # The flow branch actually trains once enabled.
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        flow_params_before, params["flow_head"]))
    assert max(moved) > 0.0


def test_point_mvsnet_trains(point_batch):
    imgs, intr, extr, ds, di, gt = point_batch
    model = PointMVSNet(flow_scales=(0.125, 0.25), inter_scales=(0.75, 0.375))
    variables = model.init(jax.random.key(1), imgs, intr, extr, ds, di,
                          num_depth=16, use_flow=True, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs, intr, extr, ds, di, num_depth=16, use_flow=True,
                train=True, mutable=["batch_stats"],
            )
            total, _ = point_mvsnet_loss(out, gt, di)
            return total, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        pu, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, pu), updates["batch_stats"], opt_state, loss

    losses = []
    for _ in range(10):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
