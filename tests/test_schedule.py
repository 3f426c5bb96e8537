"""LR schedules (reference MVSNet/train.py:125-127, CasMVSNet/utils.py:208-252,
MVSNet_pl/opt.py + utils/__init__.py:29-46)."""

import numpy as np

from mvs_tpu.train.schedule import (
    multistep_lr, parse_milestones, poly_lr, warmup_multistep_lr,
)


def test_parse_milestones():
    assert parse_milestones("10,12,14:2") == ([10, 12, 14], 0.5)
    assert parse_milestones("5") == ([5], 0.5)


def test_multistep_decay():
    s = multistep_lr(1.0, [2, 4], 0.5)
    vals = [float(s(i)) for i in range(6)]
    np.testing.assert_allclose(vals, [1, 1, 0.5, 0.5, 0.25, 0.25])


def test_warmup_multistep_starts_low():
    s = warmup_multistep_lr(1.0, [100], 0.5, warmup_steps=10)
    assert abs(float(s(0)) - 1 / 3) < 1e-6
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert abs(float(s(150)) - 0.5) < 1e-6


def test_poly_lr_matches_reference_formula():
    """lr = base * (1 - step/total)^0.9 (MVSNet_pl/utils/__init__.py:36-38)."""
    s = poly_lr(0.01, total_steps=100, poly_exp=0.9)
    for step in (0, 25, 50, 99):
        expect = 0.01 * (1 - step / 100) ** 0.9
        np.testing.assert_allclose(float(s(step)), expect, rtol=1e-6)
    # Clamped at the end, never negative.
    assert float(s(100)) == 0.0
    assert float(s(200)) == 0.0


def test_poly_lr_warmup():
    s = poly_lr(1.0, total_steps=1000, poly_exp=0.9, warmup_steps=10)
    assert abs(float(s(0)) - 1 / 3) < 1e-6
    assert float(s(10)) > 0.98


def test_build_optimizer_accepts_all_schedules():
    from mvs_tpu.cli.train import build_optimizer
    from mvs_tpu.utils.config import load_config

    for spec in ("10,12,14:2", "poly", "poly:0.5", "cosine"):
        cfg = load_config(None, [f"train.lr_schedule={spec}"])
        tx = build_optimizer(cfg, steps_per_epoch=10)
        assert tx is not None
