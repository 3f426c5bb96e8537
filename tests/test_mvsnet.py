import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mvs_tpu.geometry import compose_projection, scale_intrinsics
from mvs_tpu.models import MVSNet
from mvs_tpu.train.losses import masked_smooth_l1
from mvs_tpu.train.metrics import standard_metrics
from mvs_tpu.utils.synthetic import make_plane_scene


@pytest.fixture(scope="module")
def batch():
    scene = make_plane_scene(num_views=3, height=64, width=64, z0=10.0)
    imgs = jnp.asarray(scene.images)[None]  # (1, 3, 64, 64, 3)
    # Projections at feature (1/4) resolution, like the reference dataset.
    k_quarter = scale_intrinsics(jnp.asarray(scene.intrinsics), 0.25)
    proj = compose_projection(k_quarter, jnp.asarray(scene.extrinsics))[None]
    depth_values = jnp.linspace(8.0, 12.0, 16)[None]  # (1, 16)
    # GT depth at 1/4 res (nearest subsample is exact for a smooth plane).
    depth_gt = jnp.asarray(scene.depths[0][::4, ::4])[None]
    return imgs, proj, depth_values, depth_gt


def test_mvsnet_forward_shapes(batch):
    imgs, proj, depth_values, _ = batch
    model = MVSNet()
    params = model.init(jax.random.key(0), imgs, proj, depth_values, train=False)
    out = model.apply(params, imgs, proj, depth_values, train=False)
    assert out["depth"].shape == (1, 16, 16)
    assert out["photometric_confidence"].shape == (1, 16, 16)
    assert out["prob_volume"].shape == (1, 16, 16, 16)
    p = np.asarray(out["prob_volume"])
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)
    conf = np.asarray(out["photometric_confidence"])
    assert conf.min() >= 0 and conf.max() <= 1 + 1e-5


def test_mvsnet_refine_head(batch):
    imgs, proj, depth_values, _ = batch
    model = MVSNet(refine=True)
    params = model.init(jax.random.key(0), imgs, proj, depth_values, train=False)
    out = model.apply(params, imgs, proj, depth_values, train=False)
    assert out["refined_depth"].shape == (1, 16, 16)


def test_mvsnet_overfits_synthetic_plane(batch):
    """End-to-end differentiability: a few Adam steps must cut the loss."""
    imgs, proj, depth_values, depth_gt = batch
    mask = jnp.ones_like(depth_gt)
    model = MVSNet()
    variables = model.init(jax.random.key(0), imgs, proj, depth_values, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs, proj, depth_values, train=True,
                mutable=["batch_stats"],
            )
            return masked_smooth_l1(out["depth"], depth_gt, mask), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        param_updates, new_opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, param_updates)
        return params, updates["batch_stats"], new_opt_state, loss

    losses = []
    for _ in range(25):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def test_metrics_basic():
    gt = jnp.full((4, 4), 10.0)
    est = gt.at[0, 0].set(20.0)
    mask = jnp.ones_like(gt)
    m = standard_metrics(est, gt, mask)
    assert float(m["abs_depth_error"]) == pytest.approx(10.0 / 16)
    assert float(m["thres2mm_error"]) == pytest.approx(1 / 16)
    # Masked-out pixel doesn't count.
    m2 = standard_metrics(est, gt, mask.at[0, 0].set(0.0))
    assert float(m2["abs_depth_error"]) == 0.0
