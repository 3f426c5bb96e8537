import numpy as np
import pytest

from mvs_tpu.io import read_cam_file, read_pair_file
from mvs_tpu.io.colmap import convert_colmap, read_colmap_model
from mvs_tpu.utils.synthetic import make_plane_scene


def _write_colmap_text(tmp_path, scene):
    """Emit a minimal COLMAP text model of the synthetic plane scene."""
    sparse = tmp_path / "sparse"
    sparse.mkdir(parents=True)
    v, h, w = scene.images.shape[:3]
    k = scene.intrinsics[0]
    with open(sparse / "cameras.txt", "w") as f:
        f.write("# cameras\n")
        for cid in range(1, v + 1):
            f.write(f"{cid} PINHOLE {w} {h} {k[0,0]} {k[1,1]} {k[0,2]} {k[1,2]}\n")

    # 3D points on the plane, visible in every view.
    rng = np.random.default_rng(0)
    # Spread depths around z0 so the scene has a non-degenerate depth range.
    pts = np.stack([
        rng.uniform(-2, 2, 40), rng.uniform(-1.5, 1.5, 40),
        10.0 + rng.uniform(-1.0, 1.0, 40),
    ], axis=1)
    with open(sparse / "points3D.txt", "w") as f:
        f.write("# points\n")
        for i, p in enumerate(pts):
            # track: seen by all views (image_id, point2d_idx pairs)
            track = " ".join(f"{vid + 1} {i}" for vid in range(v))
            f.write(f"{i + 100} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 {track}\n")

    def rot_to_qvec(r):
        w_ = np.sqrt(max(0.0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
        x = (r[2, 1] - r[1, 2]) / (4 * w_)
        y = (r[0, 2] - r[2, 0]) / (4 * w_)
        z = (r[1, 0] - r[0, 1]) / (4 * w_)
        return w_, x, y, z

    with open(sparse / "images.txt", "w") as f:
        f.write("# images\n")
        for vid in range(v):
            e = scene.extrinsics[vid]
            q = rot_to_qvec(e[:3, :3])
            t = e[:3, 3]
            f.write(f"{vid + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} {vid + 1} img{vid}.jpg\n")
            f.write(" ".join(f"0 0 {i + 100}" for i in range(len(pts))) + "\n")
    (tmp_path / "images").mkdir(exist_ok=True)
    return tmp_path


def test_read_colmap_model_text(tmp_path):
    scene = make_plane_scene(num_views=3, height=48, width=64, z0=10.0)
    root = _write_colmap_text(tmp_path, scene)
    cams, images, pids, xyz = read_colmap_model(root / "sparse")
    assert len(cams) == 3 and len(images) == 3 and len(pids) == 40
    np.testing.assert_allclose(cams[1], scene.intrinsics[0], rtol=1e-5)
    assert (images[1].point3d_ids >= 100).all()


def test_convert_colmap_outputs(tmp_path):
    scene = make_plane_scene(num_views=3, height=48, width=64, z0=10.0)
    root = _write_colmap_text(tmp_path, scene)
    save = tmp_path / "mvs"
    ranges, score = convert_colmap(root, save, max_d=32, copy_images=False)

    # Depth range brackets the true plane depth (z0 = 10).
    dmin, interval, dnum, dmax = ranges[0]
    assert dmin < 10.0 < dmax
    assert dnum == 32

    cam = read_cam_file(save / "cams" / "00000000_cam.txt")
    np.testing.assert_allclose(cam.intrinsics, scene.intrinsics[0], rtol=1e-5)
    np.testing.assert_allclose(cam.extrinsics, scene.extrinsics[0], atol=1e-5)
    assert cam.depth_min == pytest.approx(dmin, rel=1e-5)

    pairs = read_pair_file(save / "pair.txt")
    assert len(pairs) == 3
    # Every view should select both other views (all share all points).
    assert sorted(pairs[0][1]) == [1, 2]
    # Symmetric positive scores.
    assert score[0, 1] == pytest.approx(score[1, 0])
    assert score[0, 1] > 0


def test_convert_colmap_inverse_depth_count(tmp_path):
    scene = make_plane_scene(num_views=3, height=48, width=64, z0=10.0)
    root = _write_colmap_text(tmp_path, scene)
    ranges, _ = convert_colmap(root, tmp_path / "mvs2", max_d=0,
                               copy_images=False)
    assert ranges[0][2] > 1  # derived a positive hypothesis count
