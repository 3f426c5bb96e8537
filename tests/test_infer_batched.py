"""Batched compiled-once inference CLI (reference CasMVSNet/test.py:147-232
reuses one model over the whole split): batch-N and batch-1 runs must write
identical depth/confidence maps, including the padded ragged tail."""

import jax
import numpy as np
import pytest

from mvs_tpu.cli import infer as cli_infer
from mvs_tpu.io import read_pfm
from mvs_tpu.train.checkpoint import CheckpointManager
from mvs_tpu.utils.config import load_config
from mvs_tpu.utils.make_synthetic_dtu import generate


@pytest.fixture(scope="module")
def infer_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu")
    generate(root, num_scans=1, num_views=5, height=64, width=96,
             num_depth=16)
    # An untrained checkpoint is enough: the contract under test is the
    # batching, not the depth quality.
    cfg = load_config(None, _overrides(root))
    from mvs_tpu.geometry import compose_projection, scale_intrinsics
    from mvs_tpu.models.registry import build_model_and_task
    from mvs_tpu.utils.synthetic import make_plane_scene
    import jax.numpy as jnp

    model, _, _ = build_model_and_task(cfg)
    scene = make_plane_scene(num_views=3, height=64, width=96, z0=10.0)
    imgs = jnp.asarray(scene.images)[None]
    intr = jnp.asarray(scene.intrinsics)[None]
    extr = jnp.asarray(scene.extrinsics)[None]
    proj = {
        f"stage{i + 1}": compose_projection(scale_intrinsics(intr, s), extr)
        for i, s in enumerate((0.25, 0.5, 1.0))
    }
    dv = jnp.linspace(8.0, 12.0, 16)[None]
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), imgs, proj, dv, train=False)
    ckpt_dir = tmp_path_factory.mktemp("ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(0, {"params": jax.device_get(variables["params"]),
                 "batch_stats": jax.device_get(variables["batch_stats"])})
    mgr.close()
    return root, ckpt_dir


def _overrides(root):
    return [
        "model.name=cas_mvsnet", "model.ndepths=8,8,8",
        f"data.eval_root={root}", f"data.eval_list={root}/lists/test.txt",
        "data.num_views=3", "data.num_depth=16", "data.interval_scale=1.0",
        "data.max_h=64", "data.max_w=96", "data.align=32",
    ]


def _run(root, ckpt_dir, out, batch_size):
    cli_infer.main(["--ckpt", str(ckpt_dir), "--out", str(out)]
                   + _overrides(root) + [f"data.batch_size={batch_size}"])


def test_batched_infer_matches_serial(infer_fixture, tmp_path):
    root, ckpt_dir = infer_fixture
    out1, out3 = tmp_path / "b1", tmp_path / "b3"
    _run(root, ckpt_dir, out1, 1)
    # 5 eval refs with batch 3 -> one full batch + a padded tail of 2.
    _run(root, ckpt_dir, out3, 3)
    compared = 0
    for p1 in sorted(out1.glob("*/depth_est/*.pfm")):
        p3 = out3 / p1.relative_to(out1)
        d1, _ = read_pfm(p1)
        d3, _ = read_pfm(p3)
        np.testing.assert_allclose(d3, d1, rtol=1e-5, atol=1e-5)
        c1, _ = read_pfm(str(p1).replace("depth_est", "confidence"))
        c3, _ = read_pfm(str(p3).replace("depth_est", "confidence"))
        np.testing.assert_allclose(c3, c1, rtol=1e-5, atol=1e-5)
        compared += 1
    assert compared == 5, compared


def test_run_batched_inference_bucketing(infer_fixture):
    """Mixed shapes land in separate buckets; every sample comes back once."""
    root, ckpt_dir = infer_fixture
    cfg = load_config(None, _overrides(root))
    from mvs_tpu.models.registry import build_model_and_task

    model, _, _ = build_model_and_task(cfg)
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore_raw()
    mgr.close()
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    from mvs_tpu.io.dtu import DTUEvalDataset

    ds = DTUEvalDataset(
        cfg.data.root or cfg.data.eval_root,
        [s.strip() for s in open(cfg.data.eval_list)],
        num_views=3, num_depth=16, interval_scale=1.0,
        max_h=64, max_w=96, align=32)
    samples = [ds[i] for i in range(len(ds))]
    # Fake a second shape bucket by centre-cropping two samples.
    for s in samples[3:]:
        s["imgs"] = s["imgs"][:, :32, :64]
    got = sorted(
        (s["scan"], s["ref_view"])
        for s, _, _ in cli_infer.run_batched_inference(
            cfg, model, variables, iter(samples), batch_size=2)
    )
    assert got == sorted((s["scan"], s["ref_view"]) for s in samples)
