"""Tanks-and-Temples eval-config smoke path.

The reference serves T&T through the exact same general_eval dataset/CLI as
DTU (CasMVSNet/test.py:453-455 — only the scan list and data root change).
Here the parity claim is that configs/cas_eval_tnt.yaml + DTUEvalDataset
work over a T&T-style tree: named scan dirs (not scanN), per-scan pair.txt,
larger frames, align-32 rescale.
"""

import os

import numpy as np
import pytest

from mvs_tpu.io.dtu import DTUEvalDataset
from mvs_tpu.utils.config import load_config
from mvs_tpu.utils.make_synthetic_dtu import generate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tnt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tnt")
    generate(root, num_scans=2, num_views=5, height=70, width=120,
             num_depth=8, tilt=(0.02, 0.01))
    # T&T scans are named, not numbered.
    os.rename(root / "scan1", root / "Family")
    os.rename(root / "scan2", root / "Horse")
    return root


def test_tnt_yaml_loads_and_lists_exist():
    cfg = load_config(os.path.join(REPO, "configs", "cas_eval_tnt.yaml"))
    assert cfg.model.name == "cas_mvsnet"
    assert cfg.data.max_w == 1920 and cfg.data.max_h == 1056
    lst = os.path.join(REPO, cfg.data.eval_list)
    scans = [ln.strip() for ln in open(lst) if ln.strip()]
    # The 8 intermediate-set scenes the reference list carries.
    assert "Family" in scans and "Train" in scans and len(scans) == 8


def test_eval_dataset_serves_named_scans(tnt_root):
    ds = DTUEvalDataset(str(tnt_root), ["Family", "Horse"], num_views=5,
                        num_depth=8, max_h=64, max_w=96, align=32)
    assert len(ds) == 10  # 5 ref views x 2 scans
    item = ds[0]
    assert item["scan"] == "Family"
    v, h, w, _ = item["imgs"].shape
    assert v == 5 and h % 32 == 0 and w % 32 == 0
    assert item["depth_values"].shape == (8,)
    assert np.isfinite(item["imgs"]).all()
