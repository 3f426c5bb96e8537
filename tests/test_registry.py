"""Model registry: config -> model plumbing (sampler / compute dtype / arch
options), mirroring how the CLIs construct models."""

import jax.numpy as jnp
import pytest

from mvs_tpu.models.registry import MODEL_NAMES, build_model_and_task
from mvs_tpu.utils.config import Config, apply_overrides


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_build_every_model(name):
    cfg = Config()
    cfg.model.name = name
    model, task, collate = build_model_and_task(cfg)
    assert model is not None and task is not None and collate.startswith("collate_")


def test_sampler_and_dtype_plumbed():
    cfg = apply_overrides(
        Config(), ["model.sampler=hat", "model.compute_dtype=bfloat16"]
    )
    for name in ("mvsnet", "cas_mvsnet", "cvp_mvsnet"):
        cfg.model.name = name
        model, _, _ = build_model_and_task(cfg)
        assert model.sampler == "hat", name
        assert model.compute_dtype == jnp.bfloat16, name


def test_aacvp_options():
    cfg = Config()
    cfg.model.name = "aacvp_mvsnet"
    model, _, _ = build_model_and_task(cfg)
    assert model.cost_mode == "group_correlation"
    assert model.attention


def test_unknown_model_rejected():
    cfg = Config()
    cfg.model.name = "nope"
    with pytest.raises(ValueError):
        build_model_and_task(cfg)


def test_band_cfg_plumbed():
    cfg = apply_overrides(
        Config(),
        ["model.sampler=hat", "model.band_h=128", "model.band_w=256",
         "model.band_tile_rows=16"],
    )
    for name in ("cas_mvsnet", "cvp_mvsnet"):
        cfg.model.name = name
        model, _, _ = build_model_and_task(cfg)
        assert model.band_cfg == {"band_h": 128, "band_w": 256,
                                  "tile_rows": 16}, name
    # Defaults (all zero) -> None, i.e. library defaults.
    cfg2 = Config()
    cfg2.model.name = "cas_mvsnet"
    model, _, _ = build_model_and_task(cfg2)
    assert model.band_cfg is None


def test_deprecated_train_bf16_maps_to_compute_dtype():
    with pytest.warns(DeprecationWarning):
        cfg = apply_overrides(Config(), ["train.bf16=1"])
    assert cfg.model.compute_dtype == "bfloat16"
