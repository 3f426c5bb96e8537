"""2D feature extractors for every pipeline variant (flax.linen, NHWC).

  * MVSNetFeatureNet   — 8-layer CNN, 3->32 ch at 1/4 res
                         (reference MVSNet/models/mvsnet.py:8-45)
  * CascadeFeatureNet  — FPN or U-Net multi-stage head: {stage1: 4b@1/4,
                         stage2: 2b@1/2, stage3: b@1/1}
                         (reference CasMVSNet/models/module.py:304-405)
  * PyramidFeatureNet  — CVP's 9-conv shared extractor applied to an image
                         pyramid (reference CVP-MVSNet/models/net.py:22-50);
                         with attention=True the last conv is replaced by the
                         AACVP self-attention layer
  * AttentionConv      — local-window self-attention with relative positional
                         embeddings (reference AACVP-MVSNet/models/Module.py:62-110)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvs_tpu.nn.blocks import ConvBlock, FoldedConv

__all__ = [
    "MVSNetFeatureNet",
    "CascadeFeatureNet",
    "PyramidFeatureNet",
    "AttentionConv",
]


class MVSNetFeatureNet(nn.Module):
    """(B, H, W, 3) -> (B, H/4, W/4, base*4) single-scale features."""

    base_channels: int = 8
    normalization: str = "batch"
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 AMP slot)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        kw = dict(normalization=self.normalization, axis_name=self.axis_name,
                  dtype=self.dtype)
        x = ConvBlock(b, (3, 3), **kw)(x, train)
        x = ConvBlock(b, (3, 3), **kw)(x, train)
        x = ConvBlock(b * 2, (5, 5), strides=2, **kw)(x, train)
        x = ConvBlock(b * 2, (3, 3), **kw)(x, train)
        x = ConvBlock(b * 2, (3, 3), **kw)(x, train)
        x = ConvBlock(b * 4, (5, 5), strides=2, **kw)(x, train)
        x = ConvBlock(b * 4, (3, 3), **kw)(x, train)
        # Final projection: plain conv, no norm/relu.
        return FoldedConv(b * 4, (3, 3), dtype=self.dtype)(x)


def _upsample2x_nearest(x):
    """Nearest-neighbor 2x upsample as a fixed depthwise transposed conv.

    Stays rank-4 NHWC end to end: the obvious broadcast-to-6D-and-reshape
    formulation makes XLA:TPU materialize a (B,H,2,W,2,C) temp in a padded
    layout costing ~6x the tensor's bytes at full DTU resolution (the round-2
    bench OOM); a 2x2 ones kernel with lhs_dilation=2 and (1,0) padding
    computes the identical result through the conv path with no intermediate.
    """
    b, h, w, c = x.shape
    kernel = jnp.ones((2, 2, 1, c), x.dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2), dimension_numbers=dn, feature_group_count=c)


class CascadeFeatureNet(nn.Module):
    """Multi-stage features: {'stage1': (B,H/4,W/4,4b), 'stage2': ..2b@1/2,
    'stage3': ..b@1/1}. arch_mode 'fpn' (lateral 1x1 + nearest upsample add)
    or 'unet' (deconv fuse)."""

    base_channels: int = 8
    num_stages: int = 3
    arch_mode: str = "fpn"
    normalization: str = "batch"
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 AMP slot)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        kw = dict(normalization=self.normalization, axis_name=self.axis_name,
                  dtype=self.dtype)
        conv0 = ConvBlock(b, (3, 3), **kw)(x, train)
        conv0 = ConvBlock(b, (3, 3), **kw)(conv0, train)

        conv1 = ConvBlock(b * 2, (5, 5), strides=2, **kw)(conv0, train)
        conv1 = ConvBlock(b * 2, (3, 3), **kw)(conv1, train)
        conv1 = ConvBlock(b * 2, (3, 3), **kw)(conv1, train)

        conv2 = ConvBlock(b * 4, (5, 5), strides=2, **kw)(conv1, train)
        conv2 = ConvBlock(b * 4, (3, 3), **kw)(conv2, train)
        conv2 = ConvBlock(b * 4, (3, 3), **kw)(conv2, train)

        outputs = {"stage1": FoldedConv(b * 4, (1, 1), use_bias=False,
                                         dtype=self.dtype)(conv2)}
        if self.num_stages == 1:
            return outputs

        if self.arch_mode == "fpn":
            final = b * 4
            intra = _upsample2x_nearest(conv2) + FoldedConv(
                final, (1, 1), dtype=self.dtype)(conv1)
            outputs["stage2"] = FoldedConv(b * 2, (3, 3), use_bias=False,
                                           dtype=self.dtype)(intra)
            if self.num_stages == 3:
                intra = _upsample2x_nearest(intra) + FoldedConv(
                    final, (1, 1), dtype=self.dtype)(conv0)
                outputs["stage3"] = FoldedConv(b, (3, 3), use_bias=False,
                                               dtype=self.dtype)(intra)
        elif self.arch_mode == "unet":
            up = nn.ConvTranspose(b * 2, (3, 3), strides=(2, 2), padding="SAME",
                                  use_bias=False, dtype=self.dtype)(conv2)
            intra = ConvBlock(b * 2, (3, 3), **kw)(
                jnp.concatenate([up, conv1], axis=-1), train)
            outputs["stage2"] = nn.Conv(b * 2, (1, 1), use_bias=False,
                                        dtype=self.dtype)(intra)
            if self.num_stages == 3:
                up = nn.ConvTranspose(b, (3, 3), strides=(2, 2), padding="SAME",
                                      use_bias=False, dtype=self.dtype)(intra)
                intra = ConvBlock(b, (3, 3), **kw)(
                    jnp.concatenate([up, conv0], axis=-1), train)
                outputs["stage3"] = nn.Conv(b, (1, 1), use_bias=False,
                                            dtype=self.dtype)(intra)
        else:
            raise ValueError(f"arch_mode must be fpn|unet, got {self.arch_mode}")
        return outputs


class AttentionConv(nn.Module):
    """Local-window self-attention (window k x k), depthwise over groups.

    For each pixel p and channel c: out[p,c] = Σ_w softmax_w(q[p,c]·k_w[p,c]) v_w[p,c]
    where w ranges over the k² window around p and keys get relative positional
    embeddings (rel_h for the row half of channels, rel_w for the column half).
    """

    features: int
    kernel_size: int = 3
    groups: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c = self.features
        k = self.kernel_size
        assert c % 2 == 0 and c % self.groups == 0
        q = nn.Conv(c, (1, 1), use_bias=False, name="query", dtype=self.dtype)(x)
        key = nn.Conv(c, (1, 1), use_bias=False, name="key", dtype=self.dtype)(x)
        val = nn.Conv(c, (1, 1), use_bias=False, name="value", dtype=self.dtype)(x)

        rel_h = self.param("rel_h", nn.initializers.normal(1.0), (k, 1, c // 2))
        rel_w = self.param("rel_w", nn.initializers.normal(1.0), (1, k, c // 2))
        rel = jnp.concatenate(
            [jnp.broadcast_to(rel_h, (k, k, c // 2)),
             jnp.broadcast_to(rel_w, (k, k, c // 2))], axis=-1
        ).reshape(k * k, c)

        pad = k // 2
        bsz, h, w, _ = x.shape
        key = jnp.pad(key, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        val = jnp.pad(val, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

        # Unfold the k x k window as a stack of shifted views (k is small and
        # static, so this unrolls into cheap slices that XLA fuses).
        logits = []
        values = []
        for dy in range(k):
            for dx in range(k):
                k_shift = jax.lax.dynamic_slice(
                    key, (0, dy, dx, 0), (bsz, h, w, c)) + rel[dy * k + dx]
                v_shift = jax.lax.dynamic_slice(val, (0, dy, dx, 0), (bsz, h, w, c))
                logits.append(q * k_shift)
                values.append(v_shift)
        logits = jnp.stack(logits, axis=-2)  # (B, H, W, k*k, C)
        values = jnp.stack(values, axis=-2)
        attn = jax.nn.softmax(logits, axis=-2)
        out = jnp.sum(attn * values, axis=-2)
        return nn.leaky_relu(out, negative_slope=0.1)


class PyramidFeatureNet(nn.Module):
    """Shared-weight extractor applied to every level of an image pyramid.

    __call__ takes a single image batch (B, H, W, 3) and returns its feature
    map (B, H, W, out_channels); callers build the pyramid and reuse the same
    module instance (shared params) per level, matching the reference.
    """

    out_channels: int = 16
    attention: bool = False  # AACVP: last layer is self-attention
    num_heads: int = 1  # AACVP attention groups
    normalization: str = "batch"
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 AMP slot)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(normalization=self.normalization, axis_name=self.axis_name,
                  dtype=self.dtype)
        x = ConvBlock(64, (3, 3), **kw)(x, train)
        x = ConvBlock(64, (3, 3), **kw)(x, train)
        x = ConvBlock(64, (3, 3), **kw)(x, train)
        x = ConvBlock(32, (3, 3), **kw)(x, train)
        x = ConvBlock(32, (3, 3), **kw)(x, train)
        x = ConvBlock(32, (3, 3), **kw)(x, train)
        x = ConvBlock(16, (3, 3), **kw)(x, train)
        x = ConvBlock(16, (3, 3), **kw)(x, train)
        if self.attention:
            return AttentionConv(self.out_channels, kernel_size=3,
                                 groups=self.num_heads, dtype=self.dtype)(x)
        return ConvBlock(self.out_channels, (3, 3), **kw)(x, train)
