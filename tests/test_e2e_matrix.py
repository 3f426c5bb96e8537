"""End-to-end quality matrix: ALL FOUR model families through the real CLI
chain on the textured multi-object fixture (tilted backdrop + occluding
spheres — make_objects_scene), with per-family error thresholds.

This is the strongest accuracy proxy available without real DTU data
(protocol: reference Evaluation/dtu/BaseEvalMain_web.m:26-77): the fixture
has occlusion boundaries, curved surfaces, and view-dependent visibility, so
a constant-depth or planar prior fails the thresholds by construction —
each family must actually learn multi-view matching.

Per-family gates are RELATIVE to the scene's constant-z0 prior floor (the
soft-argmin init bias) plus an absolute bound in hypothesis-interval units.
"""

from __future__ import annotations

import numpy as np
import pytest

from mvs_tpu.cli import evaluate as cli_evaluate
from mvs_tpu.cli import fuse as cli_fuse
from mvs_tpu.cli import infer as cli_infer
from mvs_tpu.cli import train as cli_train
from mvs_tpu.io import read_pfm
from mvs_tpu.utils.make_synthetic_dtu import generate
from mvs_tpu.utils.synthetic import make_objects_scene

Z0 = 10.0
H, W, VIEWS = 64, 96, 5


@pytest.fixture(scope="module")
def obj_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("objdtu")
    generate(root, num_scans=2, num_views=VIEWS, height=H, width=W,
             num_depth=16, scene_type="objects", tilt=(0.08, 0.05))
    return root


def _gt_scene(seed):
    # Must match the generate() call above exactly (same seed => same scene).
    return make_objects_scene(num_views=VIEWS, height=H, width=W, z0=Z0,
                              seed=seed, tilt=(0.08, 0.05))


def _depth_errors(out_dir, scans=("scan1", "scan2")):
    """Mean |est - gt| across all eval views, plus the constant-z0 floor."""
    errs, consts = [], []
    for s, scan in enumerate(scans):
        scene = _gt_scene(s)
        for v in range(VIEWS):
            pfm = out_dir / scan / "depth_est" / f"{v:08d}.pfm"
            if not pfm.exists():
                continue
            est = read_pfm(pfm)[0]
            gt = scene.depths[v]
            if est.shape != gt.shape:
                import cv2

                est = cv2.resize(est, (gt.shape[1], gt.shape[0]))
            valid = gt > 0
            errs.append(np.abs(est - gt)[valid].mean())
            consts.append(np.abs(Z0 - gt)[valid].mean())
    assert errs, "no depth maps produced"
    return float(np.mean(errs)), float(np.mean(consts))


def _run_family(root, run, out, model_args, train_args, epochs):
    cli_train.main([
        *model_args,
        f"data.root={root}", f"data.train_list={root}/lists/train.txt",
        f"data.val_list={root}/lists/val.txt", "data.num_views=3",
        "data.num_depth=16", "data.interval_scale=1.0", "data.batch_size=2",
        f"train.epochs={epochs}", "train.lr=0.002", "train.lr_schedule=99:2",
        "train.warmup_steps=4", "train.summary_every_steps=10",
        "train.bn_recal_batches=8",
        f"train.log_dir={run}", "train.mesh_data=2",
        *train_args,
    ])
    cli_infer.main([
        "--ckpt", f"{run}/ckpt", "--out", str(out),
        *model_args,
        f"data.eval_root={root}", f"data.eval_list={root}/lists/test.txt",
        "data.num_views=3", "data.num_depth=16", "data.interval_scale=1.0",
        "data.max_h=64", "data.max_w=96", "data.align=32",
    ])


def test_matrix_cas_mvsnet(obj_root, tmp_path):
    run, out = tmp_path / "run", tmp_path / "out"
    _run_family(obj_root, run, out,
                ["model.name=cas_mvsnet", "model.ndepths=8,8,8"], [], 6)
    err, const = _depth_errors(out)
    assert const > 0.4, f"fixture degenerate (const floor {const})"
    # Calibrated: trained cas reaches ~0.27 on this fixture (const floor
    # 0.48); the residual is dominated by occluded sphere rims no matcher
    # can resolve. Gate at ~20% head-room over measured.
    assert err < 0.68 * const, (err, const)
    assert err < 0.33, (err, const)

    cli_fuse.main([
        "--out", str(out), f"data.eval_root={obj_root}",
        "fusion.conf_thresh=0.3", "fusion.num_consistent=2",
        "fusion.pixel_thresh=2.0", "fusion.depth_thresh=0.05",
    ])
    report = out / "report.json"
    cli_evaluate.main(["--out", str(out), "--gt", str(obj_root),
                       "--report", str(report)])
    import json

    rep = json.loads(report.read_text())
    assert rep["aggregate"]["num_scans"] == 2
    # Constant/planar predictions land ~0.5+ units from the sphere surfaces;
    # a learned reconstruction must be several times closer.
    assert rep["aggregate"]["overall"] < 0.30, rep["aggregate"]


def test_matrix_mvsnet(obj_root, tmp_path):
    run, out = tmp_path / "run", tmp_path / "out"
    _run_family(obj_root, run, out, ["model.name=mvsnet"], [], 6)
    err, const = _depth_errors(out)
    # Calibrated: ~0.27 measured (const floor 0.48).
    assert err < 0.68 * const, (err, const)
    assert err < 0.33, (err, const)


def test_matrix_cvp_mvsnet(obj_root, tmp_path):
    run, out = tmp_path / "run", tmp_path / "out"
    _run_family(obj_root, run, out,
                ["model.name=cvp_mvsnet", "model.num_levels=2",
                 "model.coarse_depths=16",
                 # reference's hardcoded 6.8085 mm residual spacing is DTU
                 # scale; this scene's depths are ~10 units (~1% of depth,
                 # matching the reference ratio)
                 "model.train_interval=0.4"], [], 6)
    err, const = _depth_errors(out)
    assert err < 0.5 * const, (err, const)
    assert err < 0.45, (err, const)


def test_matrix_point_mvsnet(obj_root, tmp_path):
    run, out = tmp_path / "run", tmp_path / "out"
    _run_family(obj_root, run, out,
                ["model.name=point_mvsnet", "model.num_depth_coarse=16"],
                [], 6)
    err, const = _depth_errors(out)
    # PointFlow refines a 1/8-res coarse volume; at 64x96 the coarse grid is
    # 8x12, so its gate is the loosest — it must still clearly beat the
    # constant prior.
    assert err < 0.7 * const, (err, const)
    assert err < 0.6, (err, const)


def test_matrix_aacvp_mvsnet(obj_root, tmp_path):
    """The attention + group-correlation variant through the same chain."""
    run, out = tmp_path / "run", tmp_path / "out"
    _run_family(obj_root, run, out,
                ["model.name=aacvp_mvsnet", "model.num_levels=2",
                 "model.coarse_depths=16", "model.num_groups=4",
                 # attention + group-corr needs more steps than the plain
                 # variance pyramid to leave the prior on this fixture
                 "model.train_interval=0.4"], [], 16)
    err, const = _depth_errors(out)
    # AACVP's attention features are the most data-hungry family on this
    # tiny fixture (measured: 0.451 @6 epochs, 0.398 @12, vs const 0.484);
    # the gate asserts real learning + chain integrity, not parity with the
    # faster-converging families.
    assert err < 0.85 * const, (err, const)
    assert err < 0.41, (err, const)
