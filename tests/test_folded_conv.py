"""Parity: lane-folded convs == plain XLA convs (ops/folded_conv.py).

The folded path must match the unfolded lax/flax conv bit-for-bit up to f32
accumulation order, for every (kernel, stride, C_in, C_out) combination the
cost-reg U-Nets and feature CNNs use (reference
CasMVSNet/models/module.py:304-438).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_tpu.ops.folded_conv import (
    conv_folded, conv_transpose_folded2, fold_candidates,
)


def _rand(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype)


def _ref_conv(x, w, strides, padding):
    dn_in = "NDHWC" if x.ndim == 5 else "NHWC"
    dn_k = "DHWIO" if x.ndim == 5 else "HWIO"
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, (dn_in, dn_k, dn_in))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize("ci,co", [(8, 8), (16, 8), (16, 16), (32, 8),
                                   (8, 1), (64, 64)])
def test_conv3d_folded_matches_lax(ci, co):
    x = _rand((2, 4, 8, 32, ci))
    w = _rand((3, 3, 3, ci, co), seed=1) * 0.2
    got = conv_folded(x, w)
    want = _ref_conv(x, w, (1, 1, 1), "SAME")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ci,co,k", [(8, 8, 3), (16, 16, 3), (32, 8, 3),
                                     (3, 8, 3), (8, 16, 5), (32, 32, 1)])
def test_conv2d_folded_matches_lax(ci, co, k):
    x = _rand((3, 16, 64, ci))
    w = _rand((k, k, ci, co), seed=2) * 0.2
    got = conv_folded(x, w)
    want = _ref_conv(x, w, (1, 1), "SAME")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv_folded_affine_relu_epilogue():
    x = _rand((1, 4, 8, 16, 16))
    w = _rand((3, 3, 3, 16, 8), seed=3) * 0.2
    scale = _rand((8,), seed=4)
    shift = _rand((8,), seed=5)
    got = conv_folded(x, w, scale, shift, relu=True)
    want = jnp.maximum(_ref_conv(x, w, (1, 1, 1), "SAME") * scale + shift, 0.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ci,co", [(8, 16), (16, 32), (32, 64)])
@pytest.mark.parametrize("convention", ["SAME", "TORCH"])
def test_conv3d_folded_stride2_matches_lax(ci, co, convention):
    x = _rand((2, 4, 8, 32, ci))
    w = _rand((3, 3, 3, ci, co), seed=6) * 0.2
    got = conv_folded(x, w, strides=2, padding=convention)
    pad = [(1, 1)] * 3 if convention == "TORCH" else [(0, 1)] * 3
    want = _ref_conv(x, w, (2, 2, 2), pad)
    assert got.shape == (2, 2, 4, 16, co)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ci,co,k", [(8, 16, 3), (8, 16, 5), (16, 32, 5)])
def test_conv2d_folded_stride2_matches_flax_same(ci, co, k):
    """The feature nets' stride-2 blocks use flax SAME geometry."""
    import flax.linen as nn

    x = _rand((2, 16, 64, ci))
    mod = nn.Conv(co, (k, k), strides=2, padding="SAME", use_bias=False)
    var = mod.init(jax.random.key(0), x)
    want = mod.apply(var, x)
    got = conv_folded(x, var["params"]["kernel"], strides=2, padding="SAME")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ci,co", [(16, 8), (32, 16), (64, 32)])
def test_conv3d_transpose_folded2_matches_flax(ci, co):
    import flax.linen as nn

    x = _rand((1, 4, 8, 16, ci))
    mod = nn.ConvTranspose(co, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                           use_bias=False)
    var = mod.init(jax.random.key(0), x)
    want = mod.apply(var, x)
    got = conv_transpose_folded2(x, var["params"]["kernel"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ci,co", [(16, 8), (32, 16)])
def test_conv2d_transpose_folded2_matches_flax(ci, co):
    import flax.linen as nn

    x = _rand((2, 8, 32, ci))
    mod = nn.ConvTranspose(co, (3, 3), strides=(2, 2), padding="SAME",
                           use_bias=False)
    var = mod.init(jax.random.key(0), x)
    want = mod.apply(var, x)
    got = conv_transpose_folded2(x, var["params"]["kernel"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-4)


def test_gradients_flow_through_fold():
    x = _rand((1, 4, 8, 16, 16))
    w = _rand((3, 3, 3, 16, 8), seed=8) * 0.2

    def loss_folded(w_):
        return jnp.sum(conv_folded(x, w_) ** 2)

    def loss_ref(w_):
        return jnp.sum(_ref_conv(x, w_, (1, 1, 1), "SAME") ** 2)

    gf = jax.grad(loss_folded)(w)
    gr = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(gf, gr, rtol=2e-3, atol=2e-3)


def test_fold_candidates():
    # Tied folds (folded conv stays W-stride-1); see fold_candidates
    # docstring for why independently-packed folds are not used.
    assert fold_candidates(8, 8) == (16, 16)
    assert fold_candidates(16, 8) == (8, 8)
    assert fold_candidates(8, 16, w_stride=2) == (16, 8)
    assert fold_candidates(64, 64) == (2, 2)
    assert fold_candidates(128, 128) == (1, 1)
    assert fold_candidates(200, 200) == (1, 1)
    assert fold_candidates(8, 32) == (4, 4)


def test_bf16_training_gradients_flow():
    """bf16 compute must be TRAINABLE: this jax's conv transpose rule
    rejects preferred_element_type=f32 over bf16 operands, which silently
    made every bf16 train step crash (the reference's AMP-O1 analogue,
    CasMVSNet/train.py:55-59, must work). _conv_f32accum's custom vjp casts
    the cotangent to bf16 (standard mixed-precision semantics)."""
    import jax

    from mvs_tpu.ops.folded_conv import conv_folded, conv_transpose_folded2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 8)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)

    def loss(w_):
        return jnp.sum(conv_folded(x, w_.astype(jnp.bfloat16)) ** 2).astype(jnp.float32)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g, np.float32)).all()
    # Grad parity vs f32 compute (bf16 grads are quantized; loose bound).
    g32 = jax.grad(lambda w_: jnp.sum(
        conv_folded(x.astype(jnp.float32), w_) ** 2))(w)
    ga, gb = np.asarray(g, np.float32), np.asarray(g32, np.float32)
    denom = np.abs(gb).mean() + 1e-6
    assert np.abs(ga - gb).mean() / denom < 0.05

    wt = jnp.asarray(rng.standard_normal((3, 3, 8, 4)) * 0.1, jnp.float32)

    def loss_t(w_):
        return jnp.sum(conv_transpose_folded2(
            x, w_.astype(jnp.bfloat16)) ** 2).astype(jnp.float32)

    gt = jax.grad(loss_t)(wt)
    assert np.isfinite(np.asarray(gt, np.float32)).all()
