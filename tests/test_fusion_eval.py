import numpy as np
import pytest

from mvs_tpu.dtu_eval import aggregate_scans, evaluate_scan, reduce_points
from mvs_tpu.fusion import FusionConfig, fuse_depth_maps
from mvs_tpu.utils.synthetic import make_plane_scene


def test_fuse_synthetic_scene_recovers_plane():
    scene = make_plane_scene(num_views=4, height=48, width=48, z0=10.0)
    pairs = [(0, [1, 2, 3]), (1, [0, 2, 3])]
    confs = np.ones_like(scene.depths)
    xyz, rgb = fuse_depth_maps(
        scene.depths, confs, scene.images, scene.intrinsics, scene.extrinsics,
        pairs, FusionConfig(conf_thresh=0.5, num_consistent=2),
    )
    assert len(xyz) > 1000
    assert rgb is not None and rgb.shape == (len(xyz), 3)
    # All fused points must lie on the z=10 world plane.
    np.testing.assert_allclose(xyz[:, 2], 10.0, atol=0.05)


def test_fuse_rejects_inconsistent_view():
    scene = make_plane_scene(num_views=3, height=48, width=48, z0=10.0)
    depths = scene.depths.copy()
    depths[0] *= 1.2  # corrupt the ref view: nothing should survive
    confs = np.ones_like(depths)
    xyz, _ = fuse_depth_maps(
        depths, confs, None, scene.intrinsics, scene.extrinsics,
        [(0, [1, 2])], FusionConfig(conf_thresh=0.5, num_consistent=2),
    )
    assert len(xyz) < 50


def test_fuse_respects_confidence():
    scene = make_plane_scene(num_views=3, height=48, width=48, z0=10.0)
    confs = np.zeros_like(scene.depths)  # photometric gate kills everything
    xyz, _ = fuse_depth_maps(
        scene.depths, confs, None, scene.intrinsics, scene.extrinsics,
        [(0, [1, 2])], FusionConfig(conf_thresh=0.8, num_consistent=2),
    )
    assert len(xyz) == 0


def test_reduce_points_min_distance():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 10, (2000, 3))
    keep = reduce_points(pts, dst=1.0)
    kept = pts[keep]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(kept).query(kept, k=2, workers=-1)
    assert d[:, 1].min() >= 1.0  # pairwise min distance respected
    assert keep.sum() < len(pts)


def test_evaluate_scan_perfect_match():
    rng = np.random.default_rng(1)
    stl = rng.uniform(0, 100, (5000, 3))
    res = evaluate_scan(stl.copy(), stl, decimate_data=False)
    assert res.acc_mean == pytest.approx(0.0, abs=1e-9)
    assert res.comp_mean == pytest.approx(0.0, abs=1e-9)
    assert res.overall == pytest.approx(0.0, abs=1e-9)


def test_evaluate_scan_known_offset():
    # Dense GT grid plane; data = same plane shifted 1 mm in z.
    xs, ys = np.meshgrid(np.linspace(0, 50, 201), np.linspace(0, 50, 201))
    stl = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], axis=1)
    data = stl + np.array([0, 0, 1.0])
    res = evaluate_scan(data, stl, decimate_data=False)
    assert res.acc_mean == pytest.approx(1.0, rel=1e-6)
    assert res.comp_mean == pytest.approx(1.0, rel=1e-6)


def test_evaluate_scan_outlier_cutoff_and_masks():
    rng = np.random.default_rng(2)
    stl = rng.uniform(0, 100, (3000, 3))
    data = np.concatenate([stl, np.full((100, 3), 1000.0)])  # gross outliers
    res = evaluate_scan(data, stl, decimate_data=False)
    assert res.acc_mean < 0.5  # outliers beyond 20 mm discarded

    # Ground plane z>50 keeps only upper STL points for completeness.
    plane = np.array([0.0, 0.0, 1.0, -50.0])
    res_plane = evaluate_scan(stl.copy(), stl, decimate_data=False,
                              ground_plane=plane)
    assert res_plane.n_stl == int((stl[:, 2] > 50).sum())

    # ObsMask: a voxel grid covering only the x<50 half.
    bb = np.array([[0.0, 0, 0], [100.0, 100, 100]])
    grid = np.zeros((10, 20, 20), dtype=np.uint8)
    grid[:, :, :] = 1  # x-dim has 10 voxels of 5mm -> covers x in [0,50)
    res_mask = evaluate_scan(stl.copy(), stl, decimate_data=False,
                             obs_mask=(grid, bb, 5.0))
    assert res_mask.n_data < len(stl)


def test_aggregate_scans():
    r1 = evaluate_scan(np.zeros((10, 3)), np.zeros((10, 3)), decimate_data=False)
    agg = aggregate_scans([r1, r1])
    assert agg["overall"] == pytest.approx(0.0)
    assert agg["num_scans"] == 2


def test_batched_scene_fusion_matches_serial():
    """Scan-parallel (mesh 'data'-sharded, vmapped) fusion == per-scan
    fuse_scene for every scan in the batch (the reference Pool-over-scans
    parity, CasMVSNet/test.py:413-444)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mvs_tpu.fusion import (
        FusionConfig, fuse_scene, make_batched_scene_fusion, pad_pairs,
    )
    from mvs_tpu.parallel import make_mesh
    from mvs_tpu.utils.synthetic import make_plane_scene

    cfg = FusionConfig(conf_thresh=0.3, num_consistent=1, pixel_thresh=2.0,
                       depth_thresh=0.05)
    scans = [make_plane_scene(num_views=3, height=32, width=48, z0=10.0,
                              seed=s, tilt=(0.02, 0.01)) for s in range(4)]
    pairs = [(r, [v for v in range(3) if v != r]) for r in range(3)]

    serial = []
    depths, confs, intrs, extrs = [], [], [], []
    for sc in scans:
        d = np.stack(sc.depths).astype(np.float32)
        c = np.ones_like(d)
        k = np.stack(sc.intrinsics).astype(np.float32)
        e = np.stack(sc.extrinsics).astype(np.float32)
        serial.append(fuse_scene(d, c, k, e, pairs, cfg))
        depths.append(d)
        confs.append(c)
        intrs.append(k)
        extrs.append(e)

    import jax as _jax
    mesh = make_mesh(data=4, devices=_jax.devices()[:4])
    fn = make_batched_scene_fusion(mesh, cfg)
    shard = NamedSharding(mesh, P("data"))
    src_idx, src_valid = pad_pairs(pairs, 3)
    args = [np.stack(depths), np.stack(confs), np.stack(intrs),
            np.stack(extrs), np.stack([src_idx] * 4),
            np.stack([src_valid] * 4)]
    mask_b, world_b = fn(*[jax.device_put(a, shard) for a in args])
    mask_b, world_b = np.asarray(mask_b), np.asarray(world_b)

    for i, (mask_s, world_s) in enumerate(serial):
        np.testing.assert_array_equal(mask_b[i], mask_s)
        np.testing.assert_allclose(world_b[i][mask_s], world_s[mask_s],
                                   rtol=1e-5, atol=1e-5)
