import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from mvs_tpu.geometry import (
    bilinear_sample, cascade_depth_samples, compose_projection,
    epipolar_depth_interval, geometric_consistency, invert_rigid, pixel_grid,
    plane_sweep_coords, relative_projection, residual_depth_hypotheses,
    scale_intrinsics, uniform_depth_values, warp_src_feature,
)
from mvs_tpu.ops import (
    depth_regression, regress_depth_and_confidence, variance_cost_volume,
)
from mvs_tpu.utils.synthetic import make_plane_scene


def test_invert_rigid():
    rng = np.random.default_rng(0)
    # Random rotation via QR.
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    e = np.eye(4)
    e[:3, :3] = q
    e[:3, 3] = rng.standard_normal(3)
    inv = invert_rigid(jnp.asarray(e, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(inv @ e), np.eye(4), atol=1e-5)


def test_compose_and_relative_projection():
    scene = make_plane_scene(num_views=2)
    proj = compose_projection(
        jnp.asarray(scene.intrinsics), jnp.asarray(scene.extrinsics)
    )
    np.testing.assert_allclose(np.asarray(proj), scene.projections, rtol=1e-5)
    rel = relative_projection(proj[1], proj[0])
    np.testing.assert_allclose(
        np.asarray(rel @ proj[0]), np.asarray(proj[1]), rtol=1e-4, atol=1e-4
    )


def test_scale_intrinsics():
    k = jnp.asarray([[100.0, 0, 40], [0, 100, 30], [0, 0, 1]])
    k2 = scale_intrinsics(k, 0.25)
    np.testing.assert_allclose(
        np.asarray(k2), [[25, 0, 10], [0, 25, 7.5], [0, 0, 1]]
    )


def test_bilinear_sample_matches_scipy():
    rng = np.random.default_rng(1)
    feat = rng.standard_normal((20, 30, 4)).astype(np.float32)
    coords = np.stack(
        [rng.uniform(0, 29, 200), rng.uniform(0, 19, 200)], axis=-1
    ).astype(np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(coords)))
    for c in range(4):
        expected = map_coordinates(
            feat[..., c], [coords[:, 1], coords[:, 0]], order=1, mode="constant"
        )
        np.testing.assert_allclose(out[:, c], expected, rtol=1e-5, atol=1e-5)


def test_bilinear_sample_zero_outside():
    feat = jnp.ones((8, 8, 1))
    coords = jnp.asarray([[-5.0, 2.0], [2.0, -5.0], [20.0, 2.0], [3.0, 3.0]])
    out = np.asarray(bilinear_sample(feat, coords))[:, 0]
    np.testing.assert_allclose(out, [0.0, 0.0, 0.0, 1.0])


def test_identity_warp_coords():
    """Same camera -> warp coords are the pixel grid at every depth."""
    rel = jnp.eye(4)
    depths = jnp.asarray([1.0, 5.0, 10.0])
    coords = plane_sweep_coords(rel, depths, 6, 7)
    grid = np.asarray(pixel_grid(6, 7))[:2]
    for d in range(3):
        np.testing.assert_allclose(coords[d, ..., 0], grid[0], atol=1e-4)
        np.testing.assert_allclose(coords[d, ..., 1], grid[1], atol=1e-4)


def test_warp_reproduces_ref_image_at_true_depth():
    """Warping the src image at the plane's true depth reproduces the ref image."""
    scene = make_plane_scene(num_views=2, z0=10.0, jitter_angle=0.0)
    proj = jnp.asarray(scene.projections)
    rel = relative_projection(proj[1], proj[0])
    depths = jnp.asarray(scene.depths[0][None])  # (1, H, W) true per-pixel depth
    warped = warp_src_feature(jnp.asarray(scene.images[1]), rel, depths)[0]
    # Interior pixels (borders may sample outside the src image).
    err = np.abs(np.asarray(warped) - scene.images[0])[8:-8, 8:-8]
    assert err.mean() < 2e-2, err.mean()


def test_variance_cost_minimal_at_true_depth():
    scene = make_plane_scene(num_views=3, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[v], proj[0]) for v in (1, 2)])
    depths = uniform_depth_values(8.0, 0.5, 9)  # true depth 10.0 = index 4
    vol = variance_cost_volume(
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[1:]), rels, depths
    )
    cost = np.asarray(jnp.mean(vol, axis=-1))[:, 16:-16, 16:-16]
    per_depth = cost.mean(axis=(1, 2))
    assert per_depth.argmin() == 4, per_depth


def test_depth_regression_softargmin():
    scene = make_plane_scene(num_views=3, z0=10.0)
    proj = jnp.asarray(scene.projections)
    rels = jnp.stack([relative_projection(proj[v], proj[0]) for v in (1, 2)])
    depths = uniform_depth_values(8.0, 0.25, 17)
    vol = variance_cost_volume(
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[1:]), rels, depths
    )
    score = -40.0 * jnp.mean(vol, axis=-1)  # sharpen raw photometric variance
    depth, conf, prob = regress_depth_and_confidence(score, depths)
    inner = np.asarray(depth)[16:-16, 16:-16]
    assert np.abs(inner - 10.0).mean() < 0.25
    assert prob.shape == (17,) + scene.depths[0].shape
    assert np.all(np.asarray(conf) >= 0) and np.all(np.asarray(conf) <= 1 + 1e-5)


def test_photometric_confidence_four_tap_semantics():
    """The gather-free mask formulation == the reference's 4-tap
    avg_pool+gather trick (MVSNet/models/mvsnet.py:187-191): window
    {i-1, i, i+1, i+2} for i = floor of the clipped index, truncated at the
    volume edges."""
    from mvs_tpu.ops.regression import photometric_confidence

    rng = np.random.default_rng(0)
    d, h, w = 9, 5, 7
    prob = rng.random((d, h, w)).astype(np.float32)
    prob /= prob.sum(axis=0, keepdims=True)
    # Indices spanning interior and both edges (incl. out-of-range floats).
    index = rng.uniform(-1.0, d + 1.0, (h, w)).astype(np.float32)

    got = np.asarray(photometric_confidence(jnp.asarray(prob), jnp.asarray(index)))

    idx = np.clip(index, 0, d - 1).astype(np.int32)
    want = np.zeros((h, w), np.float32)
    for tap in (-1, 0, 1, 2):
        t = idx + tap
        valid = (t >= 0) & (t < d)
        tc = np.clip(t, 0, d - 1)
        want += np.take_along_axis(prob, tc[None], axis=0)[0] * valid
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_depth_regression_shapes():
    prob = jnp.full((4, 5, 6), 0.25)
    d = depth_regression(prob, jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    np.testing.assert_allclose(np.asarray(d), 2.5)
    d2 = depth_regression(prob, jnp.ones((4, 5, 6)))
    assert d2.shape == (5, 6)


def test_cascade_depth_samples_global():
    ladder = uniform_depth_values(2.0, 1.0, 5)
    samples = cascade_depth_samples(ladder, 3, None, 4, 4)
    assert samples.shape == (3, 4, 4)
    np.testing.assert_allclose(np.asarray(samples[:, 0, 0]), [2.0, 4.0, 6.0])


def test_cascade_depth_samples_perpixel():
    cur = jnp.full((4, 4), 10.0)
    samples = cascade_depth_samples(cur, 4, 0.5, 4, 4)
    assert samples.shape == (4, 4, 4)
    # Window is [10 - 2*0.5, 10 + 2*0.5] = [9, 11], 4 evenly spaced samples.
    np.testing.assert_allclose(
        np.asarray(samples[:, 1, 1]), [9.0, 9.0 + 2 / 3, 9.0 + 4 / 3, 11.0], rtol=1e-5
    )


def test_residual_depth_hypotheses():
    cur = jnp.full((3, 3), 7.0)
    hyp = residual_depth_hypotheses(cur, 0.5, num_offsets=2)
    assert hyp.shape == (4, 3, 3)
    np.testing.assert_allclose(np.asarray(hyp[:, 0, 0]), [6.0, 6.5, 7.0, 7.5])


def test_geometric_consistency_true_depths():
    scene = make_plane_scene(num_views=2, z0=10.0)
    mask, depth_rt = geometric_consistency(
        jnp.asarray(scene.depths[0]),
        jnp.asarray(scene.intrinsics[0]), jnp.asarray(scene.extrinsics[0]),
        jnp.asarray(scene.depths[1]),
        jnp.asarray(scene.intrinsics[1]), jnp.asarray(scene.extrinsics[1]),
    )
    inner = np.asarray(mask)[8:-8, 8:-8]
    assert inner.mean() > 0.99
    good = np.asarray(depth_rt)[8:-8, 8:-8]
    np.testing.assert_allclose(good, scene.depths[0][8:-8, 8:-8], rtol=2e-3)


def test_geometric_consistency_rejects_bad_depth():
    scene = make_plane_scene(num_views=2, z0=10.0)
    bad = jnp.asarray(scene.depths[0] * 1.2)  # 20% depth error >> 1% threshold
    mask, _ = geometric_consistency(
        bad,
        jnp.asarray(scene.intrinsics[0]), jnp.asarray(scene.extrinsics[0]),
        jnp.asarray(scene.depths[1]),
        jnp.asarray(scene.intrinsics[1]), jnp.asarray(scene.extrinsics[1]),
    )
    assert np.asarray(mask).mean() < 0.05


def test_epipolar_depth_interval_stereo():
    """Pure-translation stereo: a 1 px disparity step is exactly z^2/(f b - z).

    (disparity = f b / z, so inverting x_s(z') = x_s(z) + 1 gives
    Δz = z^2 / (f b - z) — the small-baseline approximation z^2/(f b) only
    holds when f b >> z.)
    """
    scene = make_plane_scene(num_views=2, z0=10.0, baseline=0.6, focal=100.0,
                             jitter_angle=0.0)
    interval = epipolar_depth_interval(
        jnp.asarray(scene.depths[0]),
        jnp.asarray(scene.intrinsics[0]), jnp.asarray(scene.extrinsics[0]),
        jnp.asarray(scene.intrinsics[1]), jnp.asarray(scene.extrinsics[1]),
    )
    expected = 10.0**2 / (100.0 * 0.6 - 10.0)
    assert float(interval) == pytest.approx(expected, rel=0.02)
