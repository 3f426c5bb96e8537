"""3D cost-volume regularization U-Nets (flax.linen, NDHWC).

  * UNetCostRegNet    — 3-level U-Net with additive skips, downsampling all of
                        (D, H, W) by 2 per level: the MVSNet CostRegNet
                        (reference MVSNet/models/mvsnet.py:48-93) and, with
                        configurable in/base channels, the per-stage cascade
                        regularizer (reference CasMVSNet/models/module.py:407-438)
  * PyramidCostRegNet — CVP/AACVP's shallower 2-level variant reused across
                        pyramid levels (reference CVP-MVSNet/models/net.py:52-89)

Volumes are (B, D, H, W, C); the channel dim rides the 128-lane axis and XLA
maps the 3D convs onto the MXU as implicit GEMMs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mvs_tpu.nn.blocks import (ConvBlock, ConvTransposeBlock, FoldedConv,
                               FusedConvBlock3D)

__all__ = ["UNetCostRegNet", "PyramidCostRegNet"]

_K3 = (3, 3, 3)


def _conv3(features, normalization, axis_name, dtype=None, **kw):
    """Stride-1 3x3x3 block: the Pallas-fused variant for batch/none norm
    (the hot path — one HBM round-trip for conv+norm+relu at inference),
    plain ConvBlock otherwise (e.g. group norm). FusedConvBlock3D follows its
    input dtype, so `dtype` only parameterizes the ConvBlock fallback."""
    if normalization in ("batch", "none"):
        return FusedConvBlock3D(features, normalization, axis_name, **kw)
    return ConvBlock(features, _K3, normalization=normalization,
                     axis_name=axis_name, dtype=dtype, **kw)


class UNetCostRegNet(nn.Module):
    """(B, D, H, W, C_in) -> (B, D, H, W) regularized score volume."""

    base_channels: int = 8
    normalization: str = "batch"
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 AMP slot)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        kw = dict(normalization=self.normalization, axis_name=self.axis_name,
                  dtype=self.dtype)
        c3 = lambda ch: _conv3(ch, self.normalization, self.axis_name,
                               dtype=self.dtype)
        conv0 = c3(b)(x, train)

        conv1 = ConvBlock(b * 2, _K3, strides=2, **kw)(conv0, train)
        conv2 = c3(b * 2)(conv1, train)

        conv3 = ConvBlock(b * 4, _K3, strides=2, **kw)(conv2, train)
        conv4 = c3(b * 4)(conv3, train)

        conv5 = ConvBlock(b * 8, _K3, strides=2, **kw)(conv4, train)
        conv6 = c3(b * 8)(conv5, train)

        x = conv4 + ConvTransposeBlock(b * 4, _K3, strides=2, **kw)(conv6, train)
        x = conv2 + ConvTransposeBlock(b * 2, _K3, strides=2, **kw)(x, train)
        x = conv0 + ConvTransposeBlock(b, _K3, strides=2, **kw)(x, train)
        # Final plain conv to a single score channel.
        score = FoldedConv(1, _K3, dtype=self.dtype)(x)
        return score[..., 0]


class PyramidCostRegNet(nn.Module):
    """(B, D, H, W, C_in) -> (B, D, H, W); shared across pyramid levels."""

    base_channels: int = 16
    normalization: str = "batch"
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 AMP slot)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        kw = dict(normalization=self.normalization, axis_name=self.axis_name,
                  dtype=self.dtype)
        c3 = lambda ch: _conv3(ch, self.normalization, self.axis_name,
                               dtype=self.dtype)
        conv0 = c3(b)(x, train)
        conv0 = c3(b)(conv0, train)

        conv2 = ConvBlock(b * 2, _K3, strides=2, **kw)(conv0, train)
        conv2 = c3(b * 2)(conv2, train)
        conv2 = c3(b * 2)(conv2, train)

        conv4 = c3(b * 4)(conv2, train)
        conv4 = c3(b * 4)(conv4, train)
        conv4 = c3(b * 4)(conv4, train)

        # Channel-halving "transpose" at stride 1, then a true 2x upsample.
        x = conv2 + ConvTransposeBlock(b * 2, _K3, strides=1, **kw)(conv4, train)
        x = conv0 + ConvTransposeBlock(b, _K3, strides=2, **kw)(x, train)
        score = FoldedConv(1, _K3, dtype=self.dtype)(x)
        return score[..., 0]
