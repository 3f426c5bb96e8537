import numpy as np
import pytest

from mvs_tpu.fusion.gipuma_bridge import export_gipuma_scene
from mvs_tpu.io.dmb import read_dmb, write_dmb
from mvs_tpu.io.pipeline import DataLoader
from mvs_tpu.utils.vis import colorize_depth, depth_image_summary


def test_dmb_roundtrip(tmp_path):
    depth = np.random.default_rng(0).random((12, 17)).astype(np.float32)
    write_dmb(tmp_path / "d.dmb", depth)
    np.testing.assert_array_equal(read_dmb(tmp_path / "d.dmb"), depth)
    normals = np.random.default_rng(1).random((5, 6, 3)).astype(np.float32)
    write_dmb(tmp_path / "n.dmb", normals)
    np.testing.assert_array_equal(read_dmb(tmp_path / "n.dmb"), normals)


def test_dmb_header_matches_fusibile(tmp_path):
    """Header must be 4 little-endian int32: type=1, h, w, c (fileIoUtils.h)."""
    write_dmb(tmp_path / "x.dmb", np.zeros((3, 4), np.float32))
    raw = (tmp_path / "x.dmb").read_bytes()
    assert np.frombuffer(raw[:16], "<i4").tolist() == [1, 3, 4, 1]
    assert len(raw) == 16 + 3 * 4 * 4


def test_export_gipuma_scene(tmp_path):
    v, h, w = 2, 8, 10
    rng = np.random.default_rng(2)
    depths = rng.uniform(5, 10, (v, h, w)).astype(np.float32)
    confs = np.full((v, h, w), 0.9, np.float32)
    confs[0, 0, 0] = 0.1  # below threshold -> zeroed depth
    intr = np.tile(np.eye(3, dtype=np.float32), (v, 1, 1))
    extr = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
    export_gipuma_scene(tmp_path, depths, confs, None, intr, extr,
                        prob_threshold=0.8)
    d0 = read_dmb(tmp_path / "2333_00000000" / "disp.dmb")
    assert d0[0, 0] == 0.0 and d0[1, 1] == pytest.approx(depths[0, 1, 1])
    n0 = read_dmb(tmp_path / "2333_00000000" / "normals.dmb")
    np.testing.assert_allclose(n0, 1 / np.sqrt(3), rtol=1e-6)
    p = np.loadtxt(tmp_path / "cams" / "00000000.jpg.P")
    assert p.shape == (3, 4)


class _FlakyDataset:
    def __init__(self, n=20, fail_every=5):
        self.n = n
        self.fail_every = fail_every

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i % self.fail_every == 1:
            raise IOError(f"corrupt sample {i}")
        return {"x": np.full((2,), float(i))}


def test_dataloader_retries_corrupt_samples():
    ds = _FlakyDataset()
    loader = DataLoader(ds, batch_size=4,
                        collate_fn=lambda s: np.stack([x["x"] for x in s]),
                        shuffle=False, shard_by_process=False, num_threads=1)
    batches = list(loader)
    assert len(batches) == 5
    for b in batches:
        assert b.shape == (4, 2)
        # No batch contains a failing index's value left as NaN etc.
        assert np.isfinite(b).all()


def test_dataloader_raises_after_retry_budget():
    class AlwaysBad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise IOError("nope")

    loader = DataLoader(AlwaysBad(), batch_size=2, collate_fn=lambda s: s,
                        shuffle=False, shard_by_process=False, num_threads=1)
    with pytest.raises(IOError):
        list(loader)


def test_vis_colormaps():
    depth = np.linspace(1, 2, 64).reshape(8, 8)
    img = colorize_depth(depth)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    panel = depth_image_summary(depth, depth * 1.01, np.ones_like(depth))
    assert panel.shape == (8, 24, 3)
