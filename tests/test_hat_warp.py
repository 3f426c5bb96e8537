import jax.numpy as jnp
import numpy as np
import pytest

from mvs_tpu.geometry import (
    plane_sweep_coords, relative_projection, uniform_depth_values,
    warp_src_feature,
)
from mvs_tpu.ops.cost_volume import variance_cost_volume
from mvs_tpu.ops.hat_warp import (
    fused_variance_volume_banded, two_pass_warp, warp_src_feature_hat,
)
from mvs_tpu.utils.synthetic import make_plane_scene


def test_hat_warp_identity():
    """Identity projection: hat warp must reproduce the image exactly
    (integer coords hit single hat peaks)."""
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((24, 32, 8)).astype(np.float32))
    rel = jnp.eye(4)
    depths = jnp.asarray([5.0, 9.0])
    out = warp_src_feature_hat(feat, rel, depths)
    for d in range(2):
        np.testing.assert_allclose(np.asarray(out[d]), np.asarray(feat),
                                   atol=1e-4)


def test_hat_warp_matches_gather_on_scene():
    """On a real view pair, the two-pass warp matches exact bilinear to
    sub-percent (the documented O(slope x cell-variation) approximation)."""
    scene = make_plane_scene(num_views=2, height=64, width=80, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rel = relative_projection(proj[1], proj[0])
    feat = jnp.asarray(scene.images[1])
    depths = uniform_depth_values(8.5, 0.5, 6)

    exact = warp_src_feature(feat, rel, depths)
    fast = warp_src_feature_hat(feat, rel, depths)
    # Compare where both are in-view (exact warp zeros out-of-view too).
    err = np.abs(np.asarray(fast) - np.asarray(exact))
    inview = np.asarray(exact[..., 0] != 0)
    assert err[inview].mean() < 5e-3, err[inview].mean()
    assert np.quantile(err[inview], 0.99) < 5e-2


def test_hat_warp_per_pixel_depths():
    """Per-pixel depth hypotheses (cascade stages 2/3 shape) stay accurate."""
    scene = make_plane_scene(num_views=2, height=48, width=64, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rel = relative_projection(proj[1], proj[0])
    feat = jnp.asarray(scene.images[1])
    # Smooth per-pixel depth around the true surface.
    base = jnp.asarray(scene.depths[0])
    hyp = jnp.stack([base - 0.3, base, base + 0.3])  # (3, H, W)

    exact = warp_src_feature(feat, rel, hyp)
    fast = warp_src_feature_hat(feat, rel, hyp)
    err = np.abs(np.asarray(fast) - np.asarray(exact))
    inview = np.asarray(exact[..., 0] != 0)
    assert err[inview].mean() < 5e-3, err[inview].mean()


def test_hat_warp_zero_out_of_view():
    feat = jnp.ones((16, 16, 2))
    # Pure translation pushing samples far outside.
    rel = jnp.eye(4).at[0, 3].set(1e5)
    depths = jnp.asarray([1.0])
    out = np.asarray(warp_src_feature_hat(feat, rel, depths))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_variance_volume_sampler_consistency():
    """Cost volumes from both samplers agree closely on a real scene."""
    scene = make_plane_scene(num_views=3, height=48, width=64, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[v], proj[0]) for v in (1, 2)])
    depths = uniform_depth_values(8.0, 0.5, 8)
    feats = jnp.asarray(scene.images)

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, depths,
                                 sampler="gather")
    vol_h = variance_cost_volume(feats[0], feats[1:], rels, depths,
                                 sampler="hat")
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_h))
    assert err.mean() < 2e-3, err.mean()
    # The argmin structure (what depth regression consumes) is preserved.
    cg = np.asarray(vol_g.mean(-1))[:, 12:-12, 12:-12].mean((1, 2))
    ch = np.asarray(vol_h.mean(-1))[:, 12:-12, 12:-12].mean((1, 2))
    assert cg.argmin() == ch.argmin()


def test_banded_variance_matches_gather():
    """Banded tiled warp agrees with the exact gather sampler on a real
    scene (bands sized to cover each tile's source window)."""
    scene = make_plane_scene(num_views=3, height=48, width=64, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[v], proj[0]) for v in (1, 2)])
    depths = uniform_depth_values(8.0, 0.5, 8)
    feats = jnp.asarray(scene.images)

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, depths,
                                 sampler="gather")
    vol_b = fused_variance_volume_banded(
        feats[0], feats[1:], rels, depths,
        tile_rows=16, tile_cols=32, band_h=48, band_w=64)
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_b))
    assert err.mean() < 2e-3, err.mean()
    cg = np.asarray(vol_g.mean(-1))[:, 12:-12, 12:-12].mean((1, 2))
    cb = np.asarray(vol_b.mean(-1))[:, 12:-12, 12:-12].mean((1, 2))
    assert cg.argmin() == cb.argmin()


def test_banded_variance_per_pixel_depths():
    """Per-pixel hypothesis tiles (cascade stage-2/3 shape) with grouped
    planes sharing a source window."""
    scene = make_plane_scene(num_views=2, height=48, width=64, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[1], proj[0])])
    feats = jnp.asarray(scene.images)
    base = jnp.asarray(scene.depths[0])
    hyp = jnp.stack([base - 0.3, base - 0.1, base + 0.1, base + 0.3])

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, hyp,
                                 sampler="gather")
    vol_b = fused_variance_volume_banded(
        feats[0], feats[1:], rels, hyp,
        tile_rows=16, tile_cols=32, band_h=48, band_w=64, depth_group=4)
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_b))
    assert err.mean() < 2e-3, err.mean()


def test_banded_variance_uneven_tiles():
    """H/W not divisible by the tile shape: padded rows/cols must not
    pollute the valid region."""
    scene = make_plane_scene(num_views=2, height=40, width=56, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[1], proj[0])])
    depths = uniform_depth_values(8.5, 0.5, 5)
    feats = jnp.asarray(scene.images)

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, depths,
                                 sampler="gather")
    vol_b = fused_variance_volume_banded(
        feats[0], feats[1:], rels, depths,
        tile_rows=16, tile_cols=32, band_h=40, band_w=56)
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_b))
    assert err.mean() < 2e-3, err.mean()
