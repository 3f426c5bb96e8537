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
from mvs_tpu.utils.synthetic import make_plane_scene, make_step_scene


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


def test_banded_sub_image_band_matches_gather():
    """Band genuinely smaller than the source image: nonzero band offsets,
    band-relative height interpolation and dynamic_slice windows must all be
    exercised (they are no-ops when band == image)."""
    scene = make_plane_scene(num_views=2, height=96, width=128, z0=10.0,
                             tilt=(0.15, 0.1))
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[1], proj[0])])
    feats = jnp.asarray(scene.images)
    base = jnp.asarray(scene.depths[0])
    hyp = jnp.stack([base - 0.2, base, base + 0.2])

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, hyp,
                                 sampler="gather")
    vol_b, off = fused_variance_volume_banded(
        feats[0], feats[1:], rels, hyp,
        tile_rows=16, tile_cols=32, band_h=48, band_w=64, depth_group=3,
        count_offband=True)
    assert int(off) == 0, f"{int(off)} off-band samples on healthy geometry"
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_b))
    assert err.mean() < 2e-3, err.mean()


def test_banded_depth_discontinuity():
    """Step scene (2.5-unit depth jump at a vertical edge): per-pixel
    hypothesis tiles straddling the discontinuity must still match gather —
    the failure mode a fronto-parallel plane can never expose."""
    scene = make_step_scene(num_views=2, height=96, width=128, baseline=1.2)
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[1], proj[0])])
    feats = jnp.asarray(scene.images)
    base = jnp.asarray(scene.depths[0])  # contains the discontinuity
    hyp = jnp.stack([base - 0.3, base, base + 0.3])

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, hyp,
                                 sampler="gather")
    vol_b, off = fused_variance_volume_banded(
        feats[0], feats[1:], rels, hyp,
        tile_rows=16, tile_cols=32, band_h=48, band_w=96, depth_group=3,
        count_offband=True)
    assert int(off) == 0, f"{int(off)} off-band samples"
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_b))
    assert err.mean() < 2e-3, err.mean()
    assert np.quantile(err, 0.999) < 0.1


def test_banded_dtu_scale_geometry():
    """DTU-scale millimetre geometry (z~600 mm, wide baseline, slanted
    surface): the default 64-px disparity budget must hold for per-pixel
    refine windows, and the banded volume must match gather."""
    scene = make_plane_scene(num_views=3, height=96, width=128, z0=600.0,
                             baseline=40.0, focal=280.0, tilt=(0.3, 0.2))
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[v], proj[0]) for v in (1, 2)])
    feats = jnp.asarray(scene.images)
    base = jnp.asarray(scene.depths[0])
    # Cascade-style refine window: 8 hypotheses, ~2.5 mm spacing.
    offs = (jnp.arange(8, dtype=jnp.float32) - 3.5) * 2.5
    hyp = base[None] + offs[:, None, None]

    vol_g = variance_cost_volume(feats[0], feats[1:], rels, hyp,
                                 sampler="gather")
    vol_b, off = fused_variance_volume_banded(
        feats[0], feats[1:], rels, hyp,
        tile_rows=16, tile_cols=32, band_h=48, band_w=96, depth_group=8,
        count_offband=True)
    assert int(off) == 0, f"{int(off)} off-band samples at DTU scale"
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_b))
    assert err.mean() < 2e-3, err.mean()


def test_offband_counter_detects_coverage_violation():
    """A source footprint wider than the band (anisotropic 2x zoom: a 32-col
    tile spans 64 source columns) must be reported by the off-band counter —
    the observability hook for the coverage contract."""
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 64, 128, 4)).astype(np.float32))
    zoom = jnp.asarray(np.diag([2.0, 1.0, 1.0, 1.0]).astype(np.float32))
    depths = jnp.full((4,), 1.0)

    _, off = fused_variance_volume_banded(
        feats[0], feats[1:], zoom[None], depths,
        tile_rows=16, tile_cols=32, band_h=32, band_w=32, depth_group=1,
        count_offband=True)
    assert int(off) > 0, "coverage violation not detected"


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


def test_banded_group_correlation_matches_gather():
    """Banded fused group-correlation (AACVP cost) vs the exact per-view
    gather construction on a real scene."""
    from mvs_tpu.ops.cost_volume import group_correlation_cost_volume

    scene = make_plane_scene(num_views=3, height=48, width=64, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[v], proj[0]) for v in (1, 2)])
    feats = jnp.asarray(np.repeat(np.asarray(scene.images), 4, axis=-1))
    base = jnp.asarray(scene.depths[0])
    hyp = jnp.stack([base - 0.3, base - 0.1, base + 0.1, base + 0.3])

    vol_g = group_correlation_cost_volume(feats[0], feats[1:], rels, hyp, 4,
                                          sampler="gather")
    vol_b = group_correlation_cost_volume(
        feats[0], feats[1:], rels, hyp, 4, sampler="hat_banded",
        band_cfg=dict(tile_rows=16, tile_cols=32, band_h=48, band_w=64,
                      depth_group=4))
    assert vol_b.shape == vol_g.shape
    err = np.abs(np.asarray(vol_g) - np.asarray(vol_b))
    assert err.mean() < 5e-3, err.mean()
