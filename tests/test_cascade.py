import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mvs_tpu.geometry import compose_projection, scale_intrinsics
from mvs_tpu.models.cas_mvsnet import CasMVSNet
from mvs_tpu.train.losses import cascade_loss
from mvs_tpu.utils.synthetic import make_plane_scene


def stage_projections(scene, scales=(0.25, 0.5, 1.0)):
    proj = {}
    for i, s in enumerate(scales):
        k = scale_intrinsics(jnp.asarray(scene.intrinsics), s)
        proj[f"stage{i + 1}"] = compose_projection(
            k, jnp.asarray(scene.extrinsics)
        )[None]
    return proj


@pytest.fixture(scope="module")
def cascade_batch():
    scene = make_plane_scene(num_views=3, height=32, width=32, z0=10.0)
    imgs = jnp.asarray(scene.images)[None]
    proj = stage_projections(scene)
    depth_values = jnp.linspace(8.0, 12.0, 32)[None]
    gt = {
        "stage1": jnp.asarray(scene.depths[0][::4, ::4])[None],
        "stage2": jnp.asarray(scene.depths[0][::2, ::2])[None],
        "stage3": jnp.asarray(scene.depths[0])[None],
    }
    masks = {k: jnp.ones_like(v) for k, v in gt.items()}
    return scene, imgs, proj, depth_values, gt, masks


def test_cascade_forward_shapes(cascade_batch):
    _, imgs, proj, depth_values, _, _ = cascade_batch
    model = CasMVSNet(ndepths=(8, 8, 8))
    params = model.init(jax.random.key(0), imgs, proj, depth_values, train=False)
    out = model.apply(params, imgs, proj, depth_values, train=False)
    assert out["stage1"]["depth"].shape == (1, 8, 8)
    assert out["stage2"]["depth"].shape == (1, 16, 16)
    assert out["stage3"]["depth"].shape == (1, 32, 32)
    assert out["depth"].shape == (1, 32, 32)
    # Depth estimates must stay inside the global hypothesis range.
    d = np.asarray(out["depth"])
    assert d.min() > 8.0 - 2.0 and d.max() < 12.0 + 2.0


def test_cascade_shared_regularizer_param_count(cascade_batch):
    _, imgs, proj, depth_values, _, _ = cascade_batch
    shared = CasMVSNet(ndepths=(8, 8, 8), share_cr=True)
    per_stage = CasMVSNet(ndepths=(8, 8, 8), share_cr=False)
    p_shared = shared.init(jax.random.key(0), imgs, proj, depth_values)
    p_per = per_stage.init(jax.random.key(0), imgs, proj, depth_values)
    n_shared = sum(x.size for x in jax.tree.leaves(p_shared["params"]))
    n_per = sum(x.size for x in jax.tree.leaves(p_per["params"]))
    assert n_shared < n_per


def test_cascade_overfits_synthetic_plane(cascade_batch):
    _, imgs, proj, depth_values, gt, masks = cascade_batch
    model = CasMVSNet(ndepths=(8, 8, 8))
    variables = model.init(jax.random.key(1), imgs, proj, depth_values, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs, proj, depth_values, train=True, mutable=["batch_stats"],
            )
            total, last = cascade_loss(out, gt, masks)
            return total, (updates, last)

        (loss, (updates, last)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        pu, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, pu), updates["batch_stats"], opt_state, loss

    losses = []
    for _ in range(15):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses
