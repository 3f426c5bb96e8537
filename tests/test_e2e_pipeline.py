"""End-to-end integration: train -> infer -> fuse -> evaluate, on disk,
through the real CLI entry points — the quality half of the north star.

Mirrors the reference's 4-process eval chain (MVSNet/eval.py:96-326 +
Evaluation/eval_dtu.sh:17-24) on the synthetic-DTU fixture. The fixture
plane is TILTED (z = z0 + 0.15x + 0.1y), so depth varies ~±1 unit across
the frustum and the untrained soft-argmin prior (mid-range-constant ≈ z0,
which is multi-view CONSISTENT and would survive fusion) scores ~0.35 units
overall — the trained bound below can only be met by actual learning.

Scale notes: 16-hypothesis ladder over [8, 12] => base interval 0.267 units;
CasMVSNet stages sweep 8 hypotheses at interval ratios (4, 2, 1).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from mvs_tpu.cli import evaluate as cli_evaluate
from mvs_tpu.cli import fuse as cli_fuse
from mvs_tpu.cli import infer as cli_infer
from mvs_tpu.cli import train as cli_train
from mvs_tpu.io import read_pfm
from mvs_tpu.utils.make_synthetic_dtu import generate

TILT = (0.15, 0.1)


@pytest.fixture(scope="module")
def e2e_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu")
    run = tmp_path_factory.mktemp("run")
    out = tmp_path_factory.mktemp("out")
    generate(root, num_scans=2, num_views=5, height=64, width=96,
             num_depth=16, tilt=TILT)

    cli_train.main([
        "model.name=cas_mvsnet", "model.ndepths=8,8,8",
        f"data.root={root}", f"data.train_list={root}/lists/train.txt",
        f"data.val_list={root}/lists/val.txt", "data.num_views=3",
        "data.num_depth=16", "data.interval_scale=1.0", "data.batch_size=2",
        "train.epochs=6", "train.lr=0.002", "train.lr_schedule=5:2",
        "train.warmup_steps=4", "train.summary_every_steps=5",
        # Short-run fixture: 30 steps of EMA lag is material, so opt in to
        # the end-of-epoch BN recalibration (default off, matching the
        # reference's long-run behavior — see TrainConfig.bn_recal_batches).
        "train.bn_recal_batches=8",
        f"train.log_dir={run}", "train.mesh_data=2",
    ])

    cli_infer.main([
        "--ckpt", f"{run}/ckpt", "--out", str(out),
        "model.name=cas_mvsnet", "model.ndepths=8,8,8",
        f"data.eval_root={root}", f"data.eval_list={root}/lists/test.txt",
        "data.num_views=3", "data.num_depth=16", "data.interval_scale=1.0",
        "data.max_h=64", "data.max_w=96", "data.align=32",
    ])

    cli_fuse.main([
        "--out", str(out), f"data.eval_root={root}",
        "fusion.conf_thresh=0.3", "fusion.num_consistent=2",
        "fusion.pixel_thresh=2.0", "fusion.depth_thresh=0.05",
    ])

    report = out / "report.json"
    cli_evaluate.main(["--out", str(out), "--gt", str(root),
                       "--report", str(report)])
    return root, run, out, report


def test_depth_maps_beat_untrained_scale(e2e_dirs):
    """Trained depth maps track the tilted plane: mean |err| well under the
    base hypothesis interval (0.267) AND under the ~0.45 unit mean deviation
    a constant-z0 prediction would have on this tilted scene."""
    root, _, out, _ = e2e_dirs
    from mvs_tpu.utils.synthetic import make_plane_scene

    errs, consts = [], []
    for s, scan in enumerate(("scan1", "scan2")):
        scene = make_plane_scene(num_views=5, height=64, width=96, z0=10.0,
                                 seed=s, tilt=TILT)
        for v in range(5):
            est = read_pfm(out / scan / "depth_est" / f"{v:08d}.pfm")[0]
            gt = scene.depths[v]
            errs.append(np.abs(est - gt).mean())
            consts.append(np.abs(10.0 - gt).mean())
    mean_err = float(np.mean(errs))
    const_err = float(np.mean(consts))
    assert const_err > 0.3, "fixture degenerate: constant prediction too good"
    assert mean_err < 0.15, (
        f"trained depth error {mean_err:.3f} (constant-z0 floor {const_err:.3f})"
    )


def test_fused_cloud_and_dtu_protocol_quality(e2e_dirs):
    """The full on-disk chain yields nonzero fused clouds and a DTU-protocol
    overall (acc+comp)/2 far below the constant-prediction plateau."""
    _, _, out, report = e2e_dirs
    rep = json.loads(report.read_text())
    assert rep["aggregate"]["num_scans"] == 2
    for scan, r in rep["per_scan"].items():
        assert r["acc"] > 0 and r["comp"] > 0, (scan, r)
    # A constant-z0 prediction fuses into the z=10 plane: ~0.35 units from
    # the tilted GT on average. Trained + fused must be several times better.
    assert rep["aggregate"]["overall"] < 0.12, rep["aggregate"]
    # Fused clouds are dense (each scan has 5 views of 64x96 = 30k pixels).
    for scan in ("scan1", "scan2"):
        ply = out / scan / "fused.ply"
        assert ply.exists()
        from mvs_tpu.io import read_ply

        n = len(read_ply(ply)["xyz"])
        assert n > 3000, f"{scan}: only {n} fused points"


def test_infer_fuse_on_disk_contract(e2e_dirs):
    """cli.infer writes the exact layout cli.fuse consumes: pfm depth+conf,
    cams at depth resolution, jpg images (not npy — reference
    CasMVSNet/test.py:189-232)."""
    _, _, out, _ = e2e_dirs
    scan = out / "scan1"
    for v in range(5):
        assert (scan / "depth_est" / f"{v:08d}.pfm").exists()
        assert (scan / "confidence" / f"{v:08d}.pfm").exists()
        assert (scan / "cams" / f"{v:08d}_cam.txt").exists()
        assert (scan / "images" / f"{v:08d}.jpg").exists()
    from mvs_tpu.io import read_cam_file

    cam = read_cam_file(scan / "cams" / "00000000_cam.txt")
    depth = read_pfm(scan / "depth_est" / "00000000.pfm")[0]
    # Intrinsics are written at depth-map resolution (cx ≈ W/2).
    assert abs(cam.intrinsics[0, 2] / depth.shape[1] - 0.5) < 0.1


def test_sampler_parity_on_trained_model(e2e_dirs):
    """Full-model sampler-parity gate: the production fast sampler ('hat' —
    dense two-pass stage 1, banded tiles stages 2/3) must produce depth maps
    within a small fraction of the stage-3 hypothesis interval of the exact
    'gather' sampler, ON TRAINED WEIGHTS. This is the accuracy statement the
    bench's throughput number stands on (configs/cas_*.yaml pin
    sampler: hat); the same delta is reported at real eval shapes by
    bench.py's depth_delta field."""
    import jax.numpy as jnp

    from mvs_tpu.models.cas_mvsnet import CasMVSNet
    from mvs_tpu.train.checkpoint import CheckpointManager
    from mvs_tpu.io.dtu import DTUEvalDataset
    from mvs_tpu.cli.infer import stack_model_inputs
    from mvs_tpu.utils.config import load_config

    root, run, _, _ = e2e_dirs
    restored = CheckpointManager(f"{run}/ckpt").restore_raw()
    variables = {"params": restored["params"]}
    if restored.get("batch_stats") is not None:
        variables["batch_stats"] = restored["batch_stats"]

    cfg = load_config(None, [
        "model.name=cas_mvsnet", "model.ndepths=8,8,8",
        "data.num_views=3", "data.num_depth=16", "data.interval_scale=1.0",
    ])
    ds = DTUEvalDataset(str(root), ["scan1"], num_views=3, num_depth=16,
                        interval_scale=1.0, max_h=64, max_w=96, align=32)
    args = stack_model_inputs(cfg, [ds[0], ds[1]])

    depths = {}
    for sampler in ("gather", "hat"):
        model = CasMVSNet(ndepths=(8, 8, 8), sampler=sampler,
                          compute_dtype=jnp.float32)
        out = model.apply(variables, *args, train=False)
        depths[sampler] = np.asarray(out["depth"], np.float32)

    delta = np.abs(depths["gather"] - depths["hat"])
    # Stage-3 interval = base interval (0.267 units) * ratio 1.
    interval = float(ds[0]["depth_interval"])
    assert delta.mean() < 0.1 * interval, (delta.mean(), interval)
    assert np.quantile(delta, 0.99) < 0.5 * interval, (
        np.quantile(delta, 0.99), interval)
