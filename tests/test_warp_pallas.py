"""Parity of the Pallas banded-warp kernel vs the exact gather sampler and
the XLA banded path (interpret mode on CPU; the TPU path compiles the same
kernel via Mosaic).
"""

import jax.numpy as jnp
import numpy as np

from mvs_tpu.geometry import relative_projection, uniform_depth_values
from mvs_tpu.ops.cost_volume import variance_cost_volume
from mvs_tpu.ops.hat_warp import fused_variance_volume_banded
from mvs_tpu.ops.warp_pallas import fused_variance_volume_pallas
from mvs_tpu.utils.synthetic import make_plane_scene, make_step_scene


def _scene_inputs(scene, nsrc):
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[v], proj[0])
                      for v in range(1, nsrc + 1)])
    feats = jnp.asarray(scene.images)
    return feats, rels


def test_pallas_matches_gather_shared_ladder():
    scene = make_plane_scene(num_views=3, height=48, width=64, z0=10.0)
    feats, rels = _scene_inputs(scene, 2)
    depths = uniform_depth_values(8.0, 0.5, 8)
    hyp = jnp.broadcast_to(depths[:, None, None], (8, 48, 64))

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, depths,
                                 sampler="gather")
    vol_p = fused_variance_volume_pallas(
        feats[0][None], feats[1:][None], rels[None], hyp[None],
        tile_rows=16, tile_cols=32, band_h=48, band_w=64, depth_group=1,
        interpret=True,
    )[0]
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_p))
    assert err.mean() < 2e-3, err.mean()
    cg = np.asarray(vol_g.mean(-1))[:, 12:-12, 12:-12].mean((1, 2))
    cp = np.asarray(vol_p.mean(-1))[:, 12:-12, 12:-12].mean((1, 2))
    assert cg.argmin() == cp.argmin()


def test_pallas_matches_banded_per_pixel():
    """Per-pixel hypotheses, grouped planes, band smaller than the image —
    the production cascade-refine configuration. Pinned against BOTH the
    gather truth and the XLA banded path (which shares its coverage
    contract)."""
    scene = make_plane_scene(num_views=2, height=96, width=128, z0=10.0,
                             tilt=(0.15, 0.1))
    feats, rels = _scene_inputs(scene, 1)
    base = jnp.asarray(scene.depths[0])
    hyp = jnp.stack([base - 0.3, base - 0.1, base + 0.1, base + 0.3])

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, hyp,
                                 sampler="gather")
    vol_b = fused_variance_volume_banded(
        feats[0], feats[1:], rels, hyp,
        tile_rows=16, tile_cols=32, band_h=48, band_w=64, depth_group=4)
    vol_p = fused_variance_volume_pallas(
        feats[0][None], feats[1:][None], rels[None], hyp[None],
        tile_rows=16, tile_cols=32, band_h=48, band_w=64, depth_group=4,
        interpret=True,
    )[0]
    err_g = np.abs(np.asarray(vol_g) - np.asarray(vol_p))
    assert err_g.mean() < 2e-3, err_g.mean()
    err_b = np.abs(np.asarray(vol_b) - np.asarray(vol_p))
    assert err_b.mean() < 1e-3, err_b.mean()


def test_pallas_batched_matches_per_sample():
    """The batch grid dim: two different scenes through one call equal two
    separate calls."""
    scenes = [make_plane_scene(num_views=2, height=48, width=64, z0=10.0,
                               seed=s) for s in (0, 1)]
    feats, rels, hyps = [], [], []
    for sc in scenes:
        f, r = _scene_inputs(sc, 1)
        feats.append(f)
        rels.append(r)
        base = jnp.asarray(sc.depths[0])
        hyps.append(jnp.stack([base - 0.2, base + 0.2]))
    ref = jnp.stack([f[0] for f in feats])
    src = jnp.stack([f[1:] for f in feats])
    rel = jnp.stack(rels)
    hyp = jnp.stack(hyps)

    vol = fused_variance_volume_pallas(
        ref, src, rel, hyp, tile_rows=16, tile_cols=32, band_h=48, band_w=64,
        depth_group=2, interpret=True)
    for i in range(2):
        vol_i = fused_variance_volume_pallas(
            ref[i:i + 1], src[i:i + 1], rel[i:i + 1], hyp[i:i + 1],
            tile_rows=16, tile_cols=32, band_h=48, band_w=64, depth_group=2,
            interpret=True)[0]
        np.testing.assert_allclose(np.asarray(vol[i]), np.asarray(vol_i),
                                   atol=1e-5)


def test_pallas_depth_discontinuity():
    """Step scene: hypothesis tiles straddling a 2.5-unit depth jump."""
    scene = make_step_scene(num_views=2, height=96, width=128, baseline=1.2)
    feats, rels = _scene_inputs(scene, 1)
    base = jnp.asarray(scene.depths[0])
    hyp = jnp.stack([base - 0.2, base, base + 0.2])

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, hyp,
                                 sampler="gather")
    vol_p = fused_variance_volume_pallas(
        feats[0][None], feats[1:][None], rels[None], hyp[None],
        tile_rows=16, tile_cols=32, band_h=64, band_w=96, depth_group=3,
        interpret=True,
    )[0]
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_p))
    assert err.mean() < 3e-3, err.mean()
