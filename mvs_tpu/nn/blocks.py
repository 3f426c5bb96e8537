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

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ConvBlock", "ConvTransposeBlock", "Norm"]


class Norm(nn.Module):
    """BatchNorm (default, reference parity) or GroupNorm."""

    normalization: str = "batch"
    axis_name: str | None = None
    group_size: int = 8

    @nn.compact
    def __call__(self, x, train: bool):
        if self.normalization == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
            )(x)
        if self.normalization == "group":
            groups = max(1, x.shape[-1] // self.group_size)
            return nn.GroupNorm(num_groups=groups)(x)
        if self.normalization == "none":
            return x
        raise ValueError(f"unknown normalization {self.normalization!r}")


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
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=self.strides,
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = Norm(self.normalization, self.axis_name)(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


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
        x = nn.ConvTranspose(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=strides,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = Norm(self.normalization, self.axis_name)(x, train)
        if self.relu:
            x = nn.relu(x)
        return x
