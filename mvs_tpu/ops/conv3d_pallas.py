"""Pallas TPU kernel: small-channel 3x3x3 convolution via lane folding.

Why this exists. The cost-volume U-Nets (reference MVSNet/models/mvsnet.py:48-93,
CasMVSNet/models/module.py:407-438) run 3D convs with 8-64 channels. On TPU the
minor ("lane") dimension is 128 wide: XLA stores a (..., 16)-channel volume
lane-padded 8x and lowers conv as an im2col-style contraction, so a single
full-resolution 16ch 3x3x3 conv at CasMVSNet stage-2 shape costs ~29 ms on a
v5e chip while moving only ~0.5 GB of useful bytes (~2% of HBM bandwidth).

The fix has two parts:
  * **Lane folding** — reshape (D, H, W, C) -> (D, H, W/F, F*C) with F*C = 128.
    This is a free (contiguous) reshape; the folded array is stored packed,
    so HBM traffic carries zero lane padding. A 3x3x3 conv in original space
    becomes a 3x3x3 conv in folded space whose (128, 128) per-tap weight
    matrices are block-banded in the fold dimension (built by
    `fold_conv3d_weights`). Dense sub-128 matmuls cost the same MXU time as
    128x128 ones, so the structural zeros are free.
  * **Halo-block reuse** — each grid step DMAs one (BD+2, BH+2, Wf+2, 128)
    halo block HBM->VMEM once and accumulates all 27 taps as
    (BD*BH*Wf, 128) @ (128, 128) matmuls into an f32 VMEM accumulator,
    instead of XLA's re-reading the input per tap.

The affine (+ReLU) epilogue of ConvBlock (inference-mode norm folds into a
per-channel scale/shift) fuses into the same kernel, saving another full
read+write of the volume.

Numerics: taps accumulate in f32 (`preferred_element_type`); parity with
`lax.conv_general_dilated` is exact up to matmul reassociation (tested to
~1e-5 relative in f32).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fold_factor",
    "fold_volume",
    "unfold_volume",
    "fold_conv3d_weights",
    "conv3d_folded",
    "conv3d_lane_folded",
]

_LANES = 128


def fold_factor(c_in: int, c_out: int) -> int:
    """Fold F = 128 / max(C_in, C_out); both sides share one spatial fold."""
    c = max(c_in, c_out)
    if c > _LANES or _LANES % c:
        return 1
    return _LANES // c


def fold_volume(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(..., D, H, W, C) -> (..., D, H, W/f, f*C); contiguous, so layout-free."""
    *lead, d, h, w, c = x.shape
    return x.reshape(*lead, d, h, w // f, f * c)


def unfold_volume(x: jnp.ndarray, f: int) -> jnp.ndarray:
    *lead, d, h, wf, fc = x.shape
    return x.reshape(*lead, d, h, wf * f, fc // f)


@functools.lru_cache(maxsize=None)
def _fold_gather_plan(f: int, c_in: int, c_out: int):
    """Static (index, mask) arrays mapping w.ravel() -> tap matrices.

    Tap order: (dz, dy, dwf) row-major with dz, dy, dwf in {0, 1, 2}
    (offset-1). Output sub-position i in a folded cell reads original column
    w = wf*f + i; its dx-neighbor lives at sub-position i+dx of folded cell
    wf + floor((i+dx)/f). Each tap-matrix element comes from at most one
    w[dz, dy, dx, a, b], so the fold is a single gather — NOT a chain of
    27*f scatter-adds, which would run per forward pass (params aren't
    constant-folded under jit) and dominated the round-1 e2e regression.
    """
    idx = np.zeros((27, f * c_in, f * c_out), np.int32)
    mask = np.zeros((27, f * c_in, f * c_out), np.float32)
    strides = np.array([9 * c_in * c_out, 3 * c_in * c_out, c_in * c_out,
                        c_out, 1])
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                for i in range(f):  # output sub-position
                    src = i + (dx - 1)
                    dwf = src // f  # -1, 0, or 1
                    j = src - dwf * f  # input sub-position
                    t = dz * 9 + dy * 3 + (dwf + 1)
                    a = np.arange(c_in)[:, None]
                    b = np.arange(c_out)[None, :]
                    flat = (dz * strides[0] + dy * strides[1] + dx * strides[2]
                            + a * strides[3] + b * strides[4])
                    idx[t, j * c_in:(j + 1) * c_in,
                        i * c_out:(i + 1) * c_out] = flat
                    mask[t, j * c_in:(j + 1) * c_in,
                         i * c_out:(i + 1) * c_out] = 1.0
    return idx, mask


def fold_conv3d_weights(w: np.ndarray | jnp.ndarray, f: int) -> jnp.ndarray:
    """(3, 3, 3, C_in, C_out) -> (27, f*C_in, f*C_out) block-banded tap mats.

    One gather + one multiply, cheap enough to run inside the jitted forward
    (see _fold_gather_plan for the layout derivation).
    """
    w = jnp.asarray(w)
    _, _, _, c_in, c_out = w.shape
    idx, mask = _fold_gather_plan(f, c_in, c_out)
    return w.reshape(-1)[idx] * jnp.asarray(mask, w.dtype)


def _conv_kernel(xp_ref, w_ref, sc_ref, sh_ref, out_ref, xs_ref, acc_ref,
                 sems, *, bd, bh, wf, l_in, relu, out_dtype, gd, gh, total):
    # Grid is (batch, depth tiles, height tiles). Batch rides the grid so the
    # pl.ANY input keeps a trivial index_map (Mosaic requires it); the halo
    # block for volume k is sliced out by a manual DMA instead.
    #
    # The halo DMA is DOUBLE-BUFFERED: grid steps run sequentially on a core
    # and scratch persists across them, so each step (a) starts the NEXT
    # step's halo copy into the other slot, then (b) waits on its own copy
    # (started by the previous step) and runs the 27 tap matmuls. The HBM
    # read of block t+1 thus overlaps the MXU work of block t — the blocking
    # start+wait in the round-2 version serialized them, which is exactly
    # why it lost its A/B against XLA conv.
    k = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    t = (k * gd + i) * gh + j
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)

    def halo_dma(s, kk, ii, jj):
        return pltpu.make_async_copy(
            xp_ref.at[kk, pl.ds(ii * bd, bd + 2), pl.ds(jj * bh, bh + 2)],
            xs_ref.at[s],
            sems.at[s],
        )

    @pl.when(t == 0)
    def _():
        halo_dma(slot, k, i, j).start()

    # Grid coordinates of step t+1 (row-major carry; carry_i implies carry_j).
    jn = j + 1
    carry_j = jn == gh
    jn = jnp.where(carry_j, 0, jn)
    i_n = jnp.where(carry_j, i + 1, i)
    carry_i = i_n == gd
    i_n = jnp.where(carry_i, 0, i_n)
    k_n = jnp.where(carry_j & carry_i, k + 1, k)

    @pl.when(t + 1 < total)
    def _():
        halo_dma(nslot, k_n, i_n, jn).start()

    halo_dma(slot, k, i, j).wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dz in range(3):
        for dy in range(3):
            for dwf in range(3):
                tap = dz * 9 + dy * 3 + dwf
                xt = xs_ref[slot, dz:dz + bd, dy:dy + bh, dwf:dwf + wf, :]
                xm = xt.reshape(bd * bh * wf, l_in)
                acc_ref[...] += jnp.dot(
                    xm, w_ref[tap], preferred_element_type=jnp.float32
                )

    y = acc_ref[...] * sc_ref[...] + sh_ref[...]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[...] = y.reshape(out_ref.shape).astype(out_dtype)


def _pick_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    b = min(target, n)
    while n % b:
        b -= 1
    return b


# Scoped-VMEM budget for one grid step (v5e exposes ~16 MiB of scoped VMEM to
# a Mosaic kernel; leave headroom for Mosaic's own spills/alignment).
_VMEM_BUDGET = 11 * 2**20


def _kernel_vmem_bytes(bd, bh, wf, wfp, l_in, l_out, itemsize):
    # VMEM tiles are (8 sublanes, 128 lanes) for f32: the minor dim rounds up
    # to 128 and the second-minor to 8 when sizing actual VMEM footprint.
    r8 = lambda n: -(-n // 8) * 8
    r128 = lambda n: -(-n // 128) * 128
    # Two halo slots: the DMA for block t+1 fills one while block t computes.
    xs = 2 * (bd + 2) * (bh + 2) * r8(wfp) * r128(l_in) * itemsize
    acc = r8(bd * bh * wf) * r128(l_out) * 4                    # f32 accumulator
    out = bd * bh * r8(wf) * r128(l_out) * itemsize * 2         # double-buffered out
    taps = 27 * r8(l_in) * r128(l_out) * itemsize
    return xs + acc + out + taps


def _fit_blocks(d, h, wf, wfp, l_in, l_out, itemsize, bd, bh):
    """Shrink (bd, bh) (divisors of d, h) until the per-step VMEM footprint
    fits the scoped budget. Prefer shrinking bh first (halo overhead grows
    as 2/b, and H is usually the larger axis with more divisor choices)."""
    bd = _pick_block(d, bd)
    bh = _pick_block(h, bh)
    while _kernel_vmem_bytes(bd, bh, wf, wfp, l_in, l_out, itemsize) > _VMEM_BUDGET:
        if bh > 1 and (bh >= bd or bd == 1):
            bh = _pick_block(h, bh - 1)
        elif bd > 1:
            bd = _pick_block(d, bd - 1)
        else:
            break  # minimum reached; let Mosaic report if still too big
    return bd, bh


@functools.partial(
    jax.jit, static_argnames=("relu", "interpret", "block_d", "block_h")
)
def conv3d_lane_folded(xf, w_taps, scale, shift, *, relu=False,
                       interpret=False, block_d=8, block_h=16):
    """Folded-layout 3x3x3 SAME conv with fused affine(+ReLU) epilogue.

    xf      (B, D, H, Wf, L_in)  batch of folded volumes (L_in = f*C_in <= 128)
    w_taps  (27, L_in, L_out) from fold_conv3d_weights
    scale   (L_out,) per-lane scale (per-channel scale tiled over the fold)
    shift   (L_out,) per-lane shift
    -> (B, D, H, Wf, L_out)

    Batch is a grid axis, NOT a vmapped pallas_call: Mosaic only lowers
    memory-space-ANY operands with a trivial index_map, and vmap would batch
    that BlockSpec (the round-1 TPU crash at batch>=2).
    """
    b, d, h, wf, l_in = xf.shape
    l_out = w_taps.shape[-1]
    # DMA slices must be sublane-tile aligned: pad the W dim so the halo'd
    # row width is a multiple of 8 and each block copies full rows.
    wfp = wf + 2 + (-(wf + 2)) % 8
    bd, bh = _fit_blocks(d, h, wf, wfp, l_in, l_out, xf.dtype.itemsize,
                         block_d, block_h)
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (1, wfp - wf - 1), (0, 0)))
    grid = (b, d // bd, h // bh)

    kernel = functools.partial(
        _conv_kernel, bd=bd, bh=bh, wf=wf, l_in=l_in, relu=relu,
        out_dtype=xf.dtype, gd=d // bd, gh=h // bh,
        total=b * (d // bd) * (h // bh),
    )
    flops = 27 * b * d * h * wf * l_in * l_out * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp, manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift
        ],
        out_specs=pl.BlockSpec(
            (1, bd, bh, wf, l_out), lambda k, i, j: (k, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wf, l_out), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bd + 2, bh + 2, wfp, l_in), xf.dtype),
            pltpu.VMEM((bd * bh * wf, l_out), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xf.size * xf.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_taps, scale.astype(jnp.float32), shift.astype(jnp.float32))


def conv3d_folded(x, w, scale=None, shift=None, *, relu=False,
                  interpret=None):
    """Drop-in 3x3x3 SAME conv for small channel counts, NDHWC or DHWC.

    x (B, D, H, W, C_in) or (D, H, W, C_in); w (3, 3, 3, C_in, C_out);
    scale/shift (C_out,) fused affine epilogue (inference-mode norm);
    returns y with x's rank and C_out channels.

    Falls back to lax.conv_general_dilated when the shape doesn't fold
    (W % F != 0 or C > 128). `interpret=None` auto-selects interpreter mode
    off-TPU so CPU tests exercise the same code path.
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    _, d, h, wd, c_in = x.shape
    c_out = w.shape[-1]
    f = fold_factor(c_in, c_out)
    explicit_kernel = interpret is True  # caller asked for the Pallas path
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    # Opt-in switch (MVS_TPU_PALLAS_CONV3D=1): measured END-TO-END on v5e at
    # the CasMVSNet eval config (1152x864, 48/32/8, bf16, batch 2), the XLA
    # conv path serves 2.15 depth-maps/s vs 1.46 with this kernel on the hot
    # path — the kernel's per-step blocking halo DMA (no pipelining against
    # the 27 tap matmuls) loses more than the lane-padding it saves. Until the
    # DMA is double-buffered, XLA conv is the default; the kernel stays
    # available for A/B runs and for shapes where lane padding dominates.
    # Explicit interpret=True (kernel parity tests) always runs the kernel.
    enabled = explicit_kernel or os.environ.get(
        "MVS_TPU_PALLAS_CONV3D", "0") == "1"
    if not enabled or f < 2 or wd % f:
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=dn)
        if scale is not None:
            y = y * scale + shift
        if relu:
            y = jnp.maximum(y, 0.0)
        return y[0] if squeeze else y

    if scale is None:
        scale = jnp.ones((c_out,), jnp.float32)
        shift = jnp.zeros((c_out,), jnp.float32)
    xf = fold_volume(x, f)
    taps = fold_conv3d_weights(w, f).astype(x.dtype)
    yf = conv3d_lane_folded(
        xf, taps, jnp.tile(scale, f), jnp.tile(shift, f),
        relu=relu, interpret=interpret,
    )
    y = unfold_volume(yf, f)
    return y[0] if squeeze else y
