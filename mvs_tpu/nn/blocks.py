"""Convolution building blocks (flax.linen), channels-last.

Equivalents of the reference's ConvBnReLU / ConvBn 2D & 3D blocks
(reference MVSNet/models/module.py:6-43). 2D tensors are NHWC, 3D volumes are
NDHWC — the layouts XLA tiles straight onto the MXU.

Normalization: BatchNorm with running stats like the reference. Under pjit a
batch-sharded mean/var is computed globally by GSPMD, so "sync BN" needs no
special machinery; `axis_name` is only threaded through for shard_map/pmap
contexts. A GroupNorm option is provided as a batch-size-independent
alternative (normalization='group').
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ConvBlock", "ConvTransposeBlock", "FusedConvBlock3D", "Norm",
           "FoldedConv", "FoldedConvTranspose"]


class FoldedConv(nn.Module):
    """Drop-in for nn.Conv(SAME) that runs the lane-folded TPU fast path.

    Small-channel convs on TPU waste most of the 128-wide lane dimension;
    ops.folded_conv reshapes F spatial columns into channels so the conv
    runs at full lane width (see that module's docstring). Parameter layout
    and initializers match nn.Conv ('kernel' DHWIO/HWIO, optional 'bias'),
    so swapping modules preserves checkpoint schemas up to the scope name.
    Odd kernels, uniform stride 1 or 2, padding SAME (flax geometry).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, scale=None, shift=None, relu: bool = False):
        """Optional (scale, shift, relu): a per-channel affine (e.g. a folded
        eval-mode BatchNorm) + ReLU fused into the conv's f32 epilogue — one
        pass instead of conv -> norm -> relu HBM round-trips."""
        from mvs_tpu.ops.folded_conv import conv_folded

        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, c_in, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        if scale is not None:
            # y = scale * (conv + bias) + shift.
            eff_scale = scale
            eff_shift = shift + (scale * bias if bias is not None else 0.0)
        elif bias is not None:
            eff_scale = jnp.ones((self.features,), jnp.float32)
            eff_shift = bias
        else:
            eff_scale = eff_shift = None
        cd = self.dtype or x.dtype
        return conv_folded(x.astype(cd), kernel, eff_scale, eff_shift,
                           strides=self.strides, relu=relu)


class FoldedConvTranspose(nn.Module):
    """Drop-in for nn.ConvTranspose(kernel 3, stride 2, SAME) on the
    lane-folded TPU fast path; parameter layout matches nn.ConvTranspose."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, scale=None, shift=None, relu: bool = False):
        from mvs_tpu.ops.folded_conv import conv_transpose_folded2

        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, c_in, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        if scale is not None:
            eff_scale = scale
            eff_shift = shift + (scale * bias if bias is not None else 0.0)
        elif bias is not None:
            eff_scale = jnp.ones((self.features,), jnp.float32)
            eff_shift = bias
        else:
            eff_scale = eff_shift = None
        cd = self.dtype or x.dtype
        return conv_transpose_folded2(x.astype(cd), kernel, eff_scale,
                                      eff_shift, relu=relu)


class Norm(nn.Module):
    """BatchNorm (default, reference parity) or GroupNorm.

    BatchNorm keeps DEBIASED running statistics: the EMA accumulators start
    at zero and are divided by ``1 - momentum^count`` when read (Adam-style
    bias correction). After many steps this is identical to the reference's
    torch BN (momentum 0.1 torch == 0.9 here), but eval-mode statistics are
    already correct after a handful of updates instead of lagging toward the
    zero/unit init for ~1/(1-m) steps — which matters for short fine-tunes
    and for this repo's small end-to-end training fixtures.
    """

    normalization: str = "batch"
    axis_name: str | None = None
    group_size: int = 8
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, affine_only: bool = False):
        """affine_only=True (eval-mode batch norm only): return the folded
        per-channel (scale, shift) with y = x*scale + shift == BN(x), for
        fusion into a preceding conv's epilogue; x is used only for its
        channel count."""
        if self.normalization == "group":
            groups = max(1, x.shape[-1] // self.group_size)
            return nn.GroupNorm(num_groups=groups)(x)
        if self.normalization == "none":
            return x
        if self.normalization != "batch":
            raise ValueError(f"unknown normalization {self.normalization!r}")

        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        acc_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        acc_var = self.variable(
            "batch_stats", "var", lambda: jnp.zeros((c,), jnp.float32))
        count = self.variable(
            "batch_stats", "count", lambda: jnp.zeros((), jnp.float32))

        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            m2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                # pmean the raw moments, NOT per-device variances: averaging
                # local variances drops the variance-of-the-means term and
                # understates the global batch variance.
                mean = jax.lax.pmean(mean, self.axis_name)
                m2 = jax.lax.pmean(m2, self.axis_name)
            # E[x^2]-E[x]^2 cancels catastrophically for large-mean/low-var
            # channels; clamp (see FusedConvBlock3D).
            var = jnp.maximum(m2 - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                acc_mean.value = m * acc_mean.value + (1 - m) * mean
                acc_var.value = m * acc_var.value + (1 - m) * var
                count.value = count.value + 1.0
        else:
            # Debias: the EMA from a zero init underestimates by 1 - m^t.
            denom = 1.0 - jnp.power(self.momentum, count.value)
            safe = jnp.maximum(denom, 1e-8)
            never = count.value < 0.5  # eval before any update: identity stats
            mean = jnp.where(never, 0.0, acc_mean.value / safe)
            var = jnp.where(never, 1.0, acc_var.value / safe)
            if affine_only:
                s = gamma * jax.lax.rsqrt(var + self.epsilon)
                return s, beta - mean * s

        y = (x.astype(jnp.float32) - mean) * gamma * jax.lax.rsqrt(
            var + self.epsilon) + beta
        return y.astype(x.dtype)


class ConvBlock(nn.Module):
    """Conv (any spatial rank via kernel_size) + norm + ReLU."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] | int = 1
    normalization: str = "batch"
    axis_name: str | None = None
    relu: bool = True
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = tuple(self.kernel_size)
        strides = self.strides
        uniform = (isinstance(strides, int)
                   or len(set(strides)) == 1) and all(k % 2 for k in ks)
        s = strides if isinstance(strides, int) else strides[0]
        folded = uniform and s in (1, 2)
        norm = Norm(self.normalization, self.axis_name)
        if folded and not train and self.normalization == "batch":
            # Inference: fold the eval-mode BN into the conv's f32 epilogue
            # (+fused ReLU) — conv+norm+relu in one pass, like
            # FusedConvBlock3D's eval path.
            aff = norm(jnp.zeros((1, self.features), x.dtype), False,
                       affine_only=True)
            return FoldedConv(self.features, ks, strides=s,
                              use_bias=self.use_bias, dtype=self.dtype,
                              name="Conv_0")(x, scale=aff[0], shift=aff[1],
                                             relu=self.relu)
        if folded:
            # Lane-folded fast path (identical math; see ops.folded_conv).
            # name='Conv_0' keeps the param path identical to the nn.Conv
            # branch (and to pre-folded checkpoints): shapes/initializers
            # already match, so restore works across the swap.
            x = FoldedConv(self.features, ks, strides=s,
                           use_bias=self.use_bias, dtype=self.dtype,
                           name="Conv_0")(x)
        else:
            x = nn.Conv(
                self.features, kernel_size=ks, strides=self.strides,
                padding="SAME", use_bias=self.use_bias, dtype=self.dtype,
            )(x)
        x = norm(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


class FusedConvBlock3D(nn.Module):
    """3x3x3 stride-1 Conv + BatchNorm + ReLU with a fused Pallas fast path.

    Owns its parameters directly (kernel / scale / bias / batch stats) so the
    inference path can fold the norm into a per-channel affine and run the
    lane-folded Pallas conv kernel (ops.conv3d_pallas) — one HBM round-trip
    for conv+norm+relu instead of XLA's im2col-style traffic at tiny channel
    counts. Training uses lax.conv + batch statistics (pmean over `axis_name`
    when set, i.e. sync-BN under shard_map) so gradients flow through
    standard XLA ops.

    Drop-in for ConvBlock(kernel_size=(3,3,3), strides=1) in the cost
    regularizers; normalization 'batch' or 'none'.
    """

    features: int
    normalization: str = "batch"
    axis_name: str | None = None
    relu: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mvs_tpu.ops.conv3d_pallas import conv3d_folded, fold_factor

        c_in = x.shape[-1]
        c_out = self.features
        # lecun_normal computes fan_in = C_in * receptive field for conv
        # kernel shapes, matching nn.Conv's default init.
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, c_in, c_out), jnp.float32,
        )
        use_bn = self.normalization == "batch"
        if self.normalization not in ("batch", "none"):
            raise ValueError(
                f"FusedConvBlock3D supports batch|none, got {self.normalization!r}")
        if use_bn:
            gamma = self.param("scale", nn.initializers.ones, (c_out,), jnp.float32)
            beta = self.param("bias", nn.initializers.zeros, (c_out,), jnp.float32)
            # Zero-initialized EMA accumulators, debiased by 1 - m^count at
            # read time (same scheme as Norm — see its docstring).
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((c_out,), jnp.float32))
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.zeros((c_out,), jnp.float32))
            ra_count = self.variable(
                "batch_stats", "count", lambda: jnp.zeros((), jnp.float32))

            def read_stats():
                denom = jnp.maximum(
                    1.0 - jnp.power(self.momentum, ra_count.value), 1e-8)
                never = ra_count.value < 0.5
                return (jnp.where(never, 0.0, ra_mean.value / denom),
                        jnp.where(never, 1.0, ra_var.value / denom))

        from mvs_tpu.ops.folded_conv import conv_folded

        f = fold_factor(c_in, c_out)
        # The Pallas kernel is opt-in for A/B runs (MVS_TPU_PALLAS_CONV3D=1);
        # the default fast path is the lane-folded XLA conv (conv_folded),
        # which measured faster end-to-end than both the Pallas kernel and
        # the plain lane-padded conv.
        pallas = os.environ.get("MVS_TPU_PALLAS_CONV3D", "0") == "1"
        pallas_ok = pallas and f >= 2 and x.shape[3] % f == 0
        if train or not pallas_ok:
            if not train:
                # Inference: fold the norm into a per-channel affine and fuse
                # it (+ReLU) into the folded conv's epilogue.
                if use_bn:
                    mean, var = read_stats()
                    scale = gamma * jax.lax.rsqrt(var + self.epsilon)
                    shift = beta - mean * scale
                else:
                    scale = shift = None
                return conv_folded(x, kernel.astype(x.dtype), scale, shift,
                                   relu=self.relu)
            y = conv_folded(x, kernel.astype(x.dtype),
                            out_dtype=jnp.float32)
            if use_bn:
                if train:
                    mean = jnp.mean(y, axis=(0, 1, 2, 3))
                    m2 = jnp.mean(jnp.square(y), axis=(0, 1, 2, 3))
                    if self.axis_name is not None:
                        # pmean raw moments (not per-device variances), then
                        # form the variance — keeps the cross-device
                        # variance-of-the-means term (see Norm).
                        mean = jax.lax.pmean(mean, self.axis_name)
                        m2 = jax.lax.pmean(m2, self.axis_name)
                    # E[x^2]-E[x]^2 can cancel to a tiny negative for
                    # large-mean/low-variance channels; rsqrt(neg) is NaN.
                    var = jnp.maximum(m2 - mean * mean, 0.0)
                    if not self.is_initializing():
                        m = self.momentum
                        ra_mean.value = m * ra_mean.value + (1 - m) * mean
                        ra_var.value = m * ra_var.value + (1 - m) * var
                        ra_count.value = ra_count.value + 1.0
                else:
                    mean, var = read_stats()
                y = (y - mean) * gamma * jax.lax.rsqrt(var + self.epsilon) + beta
            if self.relu:
                y = jnp.maximum(y, 0.0)
            return y.astype(x.dtype)

        # Inference fast path: fold norm into scale/shift, fuse into the kernel.
        if use_bn:
            mean, var = read_stats()
            scale = gamma * jax.lax.rsqrt(var + self.epsilon)
            shift = beta - mean * scale
        else:
            scale = jnp.ones((c_out,), jnp.float32)
            shift = jnp.zeros((c_out,), jnp.float32)
        # Batched natively: batch rides the Pallas grid. vmap over the
        # pallas_call is NOT legal here (its pl.ANY input must keep a
        # trivial index_map — Mosaic rejects the batched BlockSpec).
        return conv3d_folded(x, kernel, scale, shift, relu=self.relu)


class ConvTransposeBlock(nn.Module):
    """Transposed conv (exact 2x upsampling for stride 2) + norm + ReLU.

    Matches PyTorch ConvTranspose(kernel=3, stride=2, padding=1,
    output_padding=1) output sizes: out = in * stride.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] | int = 2
    normalization: str = "batch"
    axis_name: str | None = None
    relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = self.strides
        if isinstance(strides, int):
            strides = (strides,) * len(self.kernel_size)
        ks = tuple(self.kernel_size)
        folded = set(strides) == {2} and set(ks) == {3}
        norm = Norm(self.normalization, self.axis_name)
        if folded and not train and self.normalization == "batch":
            # Inference: eval-mode BN folded into the conv epilogue (+ReLU).
            aff = norm(jnp.zeros((1, self.features), x.dtype), False,
                       affine_only=True)
            return FoldedConvTranspose(
                self.features, ks, dtype=self.dtype,
                name="ConvTranspose_0")(x, scale=aff[0], shift=aff[1],
                                        relu=self.relu)
        if folded:
            # Lane-folded fast path (identical math; see ops.folded_conv).
            # name='ConvTranspose_0' preserves the nn.ConvTranspose param
            # path so pre-folded checkpoints restore unchanged.
            x = FoldedConvTranspose(self.features, ks, dtype=self.dtype,
                                    name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(
                self.features, kernel_size=ks, strides=strides,
                padding="SAME", use_bias=False, dtype=self.dtype,
            )(x)
        x = norm(x, train)
        if self.relu:
            x = nn.relu(x)
        return x
