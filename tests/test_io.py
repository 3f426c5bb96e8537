import numpy as np
import pytest

from mvs_tpu.io import (
    CameraParams, read_cam_file, read_pair_file, read_pfm, read_ply,
    write_cam_file, write_pair_file, write_pfm, write_ply,
)


def test_pfm_roundtrip_gray(tmp_path):
    img = np.random.default_rng(0).standard_normal((37, 53)).astype(np.float32)
    path = tmp_path / "depth.pfm"
    write_pfm(path, img)
    back, scale = read_pfm(path)
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0


def test_pfm_roundtrip_color(tmp_path):
    img = np.random.default_rng(1).random((16, 24, 3)).astype(np.float32)
    path = tmp_path / "img.pfm"
    write_pfm(path, img, scale=2.5)
    back, scale = read_pfm(path)
    np.testing.assert_array_equal(back, img)
    assert scale == 2.5


def test_pfm_reads_reference_writer_output(tmp_path):
    """Byte-level parity with the reference save_pfm format (flipud + neg scale)."""
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = tmp_path / "ref.pfm"
    with open(path, "wb") as f:
        f.write(b"Pf\n4 3\n-1.000000\n")
        np.flipud(img).astype("<f4").tofile(f)
    back, _ = read_pfm(path)
    np.testing.assert_array_equal(back, img)


def test_cam_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    cam = CameraParams(
        intrinsics=rng.random((3, 3)).astype(np.float32),
        extrinsics=rng.random((4, 4)).astype(np.float32),
        depth_min=425.0,
        depth_interval=2.5,
        num_depth=192,
        depth_max=905.0,
    )
    path = tmp_path / "00000000_cam.txt"
    write_cam_file(path, cam)
    back = read_cam_file(path)
    np.testing.assert_allclose(back.intrinsics, cam.intrinsics, rtol=1e-6)
    np.testing.assert_allclose(back.extrinsics, cam.extrinsics, rtol=1e-6)
    assert back.depth_min == pytest.approx(425.0)
    assert back.depth_interval == pytest.approx(2.5)
    assert back.num_depth == 192
    assert back.depth_max == pytest.approx(905.0)


def test_cam_two_field_last_line(tmp_path):
    cam = CameraParams(
        intrinsics=np.eye(3, dtype=np.float32),
        extrinsics=np.eye(4, dtype=np.float32),
        depth_min=1.0,
        depth_interval=0.5,
    )
    path = tmp_path / "cam.txt"
    write_cam_file(path, cam)
    back = read_cam_file(path, interval_scale=1.06)
    assert back.depth_interval == pytest.approx(0.53)
    assert back.num_depth is None


def test_pair_roundtrip(tmp_path):
    pairs = [(0, [(10, 100.5), (1, 50.25)]), (1, [(0, 42.0)])]
    path = tmp_path / "pair.txt"
    write_pair_file(path, pairs)
    back = read_pair_file(path)
    assert back == [(0, [10, 1]), (1, [0])]


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    xyz = rng.standard_normal((100, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (100, 3)).astype(np.uint8)
    normals = rng.standard_normal((100, 3)).astype(np.float32)
    path = tmp_path / "cloud.ply"
    write_ply(path, xyz, rgb=rgb, normals=normals)
    back = read_ply(path)
    np.testing.assert_array_equal(back["xyz"], xyz)
    np.testing.assert_array_equal(back["rgb"], rgb)
    np.testing.assert_array_equal(back["normals"], normals)


def test_ply_xyz_only(tmp_path):
    xyz = np.zeros((5, 3), dtype=np.float32)
    path = tmp_path / "bare.ply"
    write_ply(path, xyz)
    back = read_ply(path)
    assert back["xyz"].shape == (5, 3)
    assert "rgb" not in back
