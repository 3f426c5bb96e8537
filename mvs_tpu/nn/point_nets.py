"""Point-MVSNet network modules: ImageConv, VolumeConv, EdgeConv, SharedMLP.

References: PointMVSNet/pointmvsnet/networks.py — ImageConv (:84-124,
4-scale 2D tower), VolumeConv (:127-167, 3-level U-Net with a parallel
stride-1 branch), EdgeConv/EdgeConvNoC (:9-81, DGCNN-style edge features over
a kNN graph), SharedMLP (pointmvsnet/nn/ 1x1 conv stacks).

Point features here are (N, C) channels-last; the kNN gather pulls whole
C-rows (see mvs_tpu.ops.point_ops.gather_neighbors).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mvs_tpu.nn.blocks import ConvBlock, ConvTransposeBlock, Norm
from mvs_tpu.ops.point_ops import gather_neighbors

__all__ = ["ImageConv", "VolumeConv", "EdgeConv", "SharedMLP"]

_K3 = (3, 3, 3)


class ImageConv(nn.Module):
    """4-scale feature tower: {'conv0': b@1, 'conv1': 2b@1/2, 'conv2': 4b@1/4,
    'conv3': 8b@1/8}."""

    base_channels: int = 8
    normalization: str = "batch"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        kw = dict(normalization=self.normalization, axis_name=self.axis_name)
        out = {}
        x = ConvBlock(b, (3, 3), **kw)(x, train)
        x = ConvBlock(b, (3, 3), **kw)(x, train)
        out["conv0"] = x
        x = ConvBlock(b * 2, (5, 5), strides=2, **kw)(x, train)
        x = ConvBlock(b * 2, (3, 3), **kw)(x, train)
        x = ConvBlock(b * 2, (3, 3), **kw)(x, train)
        out["conv1"] = x
        x = ConvBlock(b * 4, (5, 5), strides=2, **kw)(x, train)
        x = ConvBlock(b * 4, (3, 3), **kw)(x, train)
        x = ConvBlock(b * 4, (3, 3), **kw)(x, train)
        out["conv2"] = x
        x = ConvBlock(b * 8, (5, 5), strides=2, **kw)(x, train)
        x = ConvBlock(b * 8, (3, 3), **kw)(x, train)
        out["conv3"] = nn.Conv(b * 8, (3, 3), padding="SAME", use_bias=False)(x)
        return out


class VolumeConv(nn.Module):
    """(B, D, H, W, C) -> (B, D, H, W) coarse cost regularizer.

    U-Net with stride-2 encoder (3 levels) plus a parallel stride-1 branch at
    every level feeding the decoder's additive skips.
    """

    base_channels: int = 8
    normalization: str = "batch"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        kw = dict(normalization=self.normalization, axis_name=self.axis_name)
        conv0_1 = ConvBlock(b, _K3, **kw)(x, train)

        conv1_0 = ConvBlock(b * 2, _K3, strides=2, **kw)(x, train)
        conv2_0 = ConvBlock(b * 4, _K3, strides=2, **kw)(conv1_0, train)
        conv3_0 = ConvBlock(b * 8, _K3, strides=2, **kw)(conv2_0, train)

        conv1_1 = ConvBlock(b * 2, _K3, **kw)(conv1_0, train)
        conv2_1 = ConvBlock(b * 4, _K3, **kw)(conv2_0, train)
        conv3_1 = ConvBlock(b * 8, _K3, **kw)(conv3_0, train)

        def up_add(y, skip):
            # Stride-2 transposed convs produce 2*ceil(n/2); crop to the
            # encoder skip's extent so odd spatial/depth sizes (e.g. W/32=3
            # at 96-px eval frames) stay valid — standard U-Net cropping.
            y = y[:, :skip.shape[1], :skip.shape[2], :skip.shape[3]]
            return y + skip

        conv4_0 = ConvTransposeBlock(b * 4, _K3, strides=2, **kw)(conv3_1, train)
        conv5_0 = ConvTransposeBlock(b * 2, _K3, strides=2, **kw)(
            up_add(conv4_0, conv2_1), train)
        conv6_0 = ConvTransposeBlock(b, _K3, strides=2, **kw)(
            up_add(conv5_0, conv1_1), train)

        score = nn.Conv(1, _K3, padding="SAME", use_bias=False)(
            up_add(conv6_0, conv0_1))
        return score[..., 0]


class EdgeConv(nn.Module):
    """DGCNN edge convolution over a precomputed kNN graph.

    features (N, C_in), nn_idx (N, k) -> (N, out) where the edge message is
    [central, neighbour - central] (concat=True) or just the difference
    (concat=False == reference EdgeConvNoC), batch-normed, relu'd, then
    mean-pooled over the k neighbours.
    """

    features: int
    concat_central: bool = True
    normalization: str = "batch"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, nn_idx, train: bool = False):
        """x (..., N, C_in), nn_idx (..., N, k) with matching leading batch dims."""
        import jax

        central = nn.Dense(self.features, use_bias=False, name="conv1")(x)
        edge = nn.Dense(self.features, use_bias=False, name="conv2")(x)
        gather = gather_neighbors
        for _ in range(x.ndim - 2):
            gather = jax.vmap(gather)
        neigh = gather(edge, nn_idx)  # (..., N, k, C)
        diff = neigh - central[..., None, :]
        if self.concat_central:
            k = nn_idx.shape[-1]
            central_rep = jnp.broadcast_to(
                central[..., None, :], central.shape[:-1] + (k, self.features)
            )
            msg = jnp.concatenate([central_rep, diff], axis=-1)
        else:
            msg = diff
        msg = Norm(self.normalization, self.axis_name)(msg, train)
        msg = nn.relu(msg)
        return jnp.mean(msg, axis=-2)  # (..., N, out)


class SharedMLP(nn.Module):
    """Per-point MLP: Dense+norm+relu per hidden layer (1x1 conv equivalent)."""

    channels: Sequence[int]
    normalization: str = "batch"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for c in self.channels:
            x = nn.Dense(c, use_bias=False)(x)
            x = Norm(self.normalization, self.axis_name)(x, train)
            x = nn.relu(x)
        return x
