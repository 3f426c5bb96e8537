"""Lane-folded convolutions as full-width XLA convs (the TPU fast path).

Problem. The cost-volume U-Nets and feature CNNs run convs at 8-32 channels
(reference MVSNet/models/mvsnet.py:48-93, CasMVSNet/models/module.py:304-438).
The TPU vector lane dimension is 128 wide: XLA stores an (..., 8)-channel
array lane-padded 16x and its conv kernels move (and compute over) mostly
padding — the measured cost-reg U-Nets ran ~40x off HBM speed-of-light.

Trick. Reshape (..., W, C) -> (..., W/F, F*C) with F*C = 128 (a free,
contiguous "fold" of F spatial columns into channels). A conv along W in
original space is EXACTLY a conv along the folded W whose kernel is
block-banded over the fold: output sub-position i of folded cell wf reads
original column s*(wf*F_out + i) + dx - pad, i.e. sub-position
j = t mod F_in of folded cell wf + t//F_in with t = s*i + dx - pad.
Building that (..., kw_cells, F_in*C_in, F_out*C_out) kernel from the dense
(..., kw, C_in, C_out) weights is a static gather; the conv itself is a
STANDARD ``lax.conv_general_dilated`` at 128 channels — zero lane padding,
full MXU utilization, XLA's own conv pipelining. W-strides are absorbed by
the fold (F_in = s * F_out), so the folded conv strides only the leading
spatial dims. The structural zeros cost F x more MXU FLOPs, the cheap
currency here (these ops are bandwidth-bound by >40x).

Transposed stride-2 (U-Net decoder, C halves so F_out = 2*F_in) folds the
upsample into the unfold: out w = wf*F_out + i sums in[(w + dx - 2)/2] over
parity-matched dx (flax ConvTranspose SAME geometry, pinned by impulse
probe), landing in folded cells wf + {-1, 0} — again a stride-1 folded conv,
with the leading axes LHS-dilated by 2 like any transposed conv.

All variants are plain differentiable XLA (gather + reshape + conv), so the
same path serves training; parity with the unfolded lax/flax convs is exact
up to f32 accumulation order (tests/test_folded_conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fold_candidates",
    "fold_width",
    "unfold_width",
    "conv_folded",
    "conv_transpose_folded2",
]

_LANES = 128


def _pow2_floor(n: int) -> int:
    return 1 << (n.bit_length() - 1) if n >= 1 else 0


def fold_candidates(c_in: int, c_out: int, w_stride: int = 1) -> tuple[int, int]:
    """(F_in, F_out) with F_in*C_in <= 128, F_out*C_out <= 128 and
    F_in = w_stride * F_out (tied folds: the folded conv is W-stride-1);
    (1, 1) when no fold fits.

    Independently-packed folds (both sides at exactly 128 lanes, folded
    W-stride s*F_out/F_in > 1) would remove the structural-zero factor
    128/(F*C) entirely, and the plan machinery below supports them — but
    measured on v5e, XLA tiles the resulting strided-W kernels badly
    (stage-2 conv0 2x SLOWER, minutes of extra compile), so the tied fold
    is the production choice.
    """
    f_out = _pow2_floor(_LANES // max(c_in * w_stride, c_out))
    if f_out < 1:
        return 1, 1
    return f_out * w_stride, f_out


def fold_width(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(..., W, C) -> (..., W/f, f*C); contiguous reshape (layout-free)."""
    if f == 1:
        return x
    *lead, w, c = x.shape
    return x.reshape(*lead, w // f, f * c)


def unfold_width(x: jnp.ndarray, f: int) -> jnp.ndarray:
    if f == 1:
        return x
    *lead, wf, fc = x.shape
    return x.reshape(*lead, wf * f, fc // f)


@functools.lru_cache(maxsize=None)
def _plan(lead_kernel: tuple, kw: int, c_in: int, c_out: int, f_in: int,
          f_out: int, stride: int, p_lo: int, transpose: bool):
    """Static (gather-index, mask, (wf_pad_lo, wf_pad_hi)) mapping
    w.ravel() -> the folded kernel.

    conv:      t(i, dx) = stride*i + dx - p_lo
    transpose: t(i, dx) = (i + dx - p_lo)/2 when parity matches (stride 2)
    Folded cell offset = t // f_in, sub-position j = t mod f_in. The folded
    conv runs at W-stride S_f = stride*f_out/f_in (1 for tied folds);
    wf padding (-c_lo, c_hi + 1 - S_f) keeps out cells = in cells / S_f.
    """
    def sub(i, dx):
        if transpose:
            t = i + dx - p_lo
            if t % 2:
                return None
            t //= 2
        else:
            t = stride * i + dx - p_lo
        return t // f_in, t % f_in

    hits = [sub(i, dx) for i in range(f_out) for dx in range(kw)]
    cells = sorted({s[0] for s in hits if s is not None})
    c_lo, c_hi = cells[0], cells[-1]
    n_cells = c_hi - c_lo + 1

    # One-hot shift tensor S[cell, dx, j, i]: the folded kernel is the
    # Kronecker-style product wf[..., cell, j*Ci+a, i*Co+b] =
    # sum_dx S[cell, dx, j, i] * w[..., dx, a, b] — a single tiny einsum at
    # trace time. (A flat scalar gather here ran EVERY forward pass and
    # cost ~40 ms/step across the ~30 conv layers of the cascade.)
    shifts = np.zeros((n_cells, kw, f_in, f_out), np.float32)
    for i in range(f_out):
        for dx in range(kw):
            s = sub(i, dx)
            if s is None:
                continue
            dwf, j = s
            shifts[dwf - c_lo, dx, j, i] = 1.0
    s_f = 1 if transpose else stride * f_out // f_in
    return shifts, (-c_lo, c_hi + 1 - s_f)


def _fold_w(w, f_in, f_out, stride, p_lo, transpose=False):
    lead_kernel = tuple(int(k) for k in w.shape[:-3])
    kw = int(w.shape[-3])
    c_in, c_out = int(w.shape[-2]), int(w.shape[-1])
    shifts, wpad = _plan(lead_kernel, kw, c_in, c_out, f_in, f_out,
                         stride, p_lo, transpose)
    wf = jnp.einsum("ckfg,...kab->...cfagb", jnp.asarray(shifts, w.dtype), w)
    return wf.reshape(*w.shape[:-3], shifts.shape[0],
                      f_in * c_in, f_out * c_out), wpad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _conv_f32accum(x, w, strides, padding, lhs_dilation, dn):
    """conv with f32 MXU accumulation that remains DIFFERENTIABLE for low-
    precision inputs: this jax's conv transpose rule rejects
    preferred_element_type=f32 with bf16 operands (the f32 cotangent meets
    the bf16 operand inside the transposed conv -> dtype-mismatch error), so
    bf16 TRAINING through any conv here would crash. The custom vjp casts
    the cotangent to the input dtype first — standard mixed-precision
    semantics (torch AMP computes grads in half precision too)."""
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, lhs_dilation=lhs_dilation,
        dimension_numbers=dn, preferred_element_type=jnp.float32)


def _conv_f32accum_fwd(x, w, strides, padding, lhs_dilation, dn):
    return _conv_f32accum(x, w, strides, padding, lhs_dilation, dn), (x, w)


def _conv_f32accum_bwd(strides, padding, lhs_dilation, dn, res, g):
    x, w = res

    def plain(a, b):
        return jax.lax.conv_general_dilated(
            a, b, strides, padding, lhs_dilation=lhs_dilation,
            dimension_numbers=dn)

    # The primal value from vjp is unused -> XLA dead-code-eliminates it;
    # only the two transpose convs survive.
    _, vjp = jax.vjp(plain, x, w)
    return vjp(g.astype(x.dtype))


_conv_f32accum.defvjp(_conv_f32accum_fwd, _conv_f32accum_bwd)


def _conv(x, w, strides, padding, lhs_dilation=None):
    dn_in = "NDHWC" if x.ndim == 5 else "NHWC"
    dn_k = "DHWIO" if x.ndim == 5 else "HWIO"
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, (dn_in, dn_k, dn_in))
    w = w.astype(x.dtype)
    if x.dtype == jnp.float32:
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, lhs_dilation=lhs_dilation,
            dimension_numbers=dn, preferred_element_type=jnp.float32)
    return _conv_f32accum(x, w, tuple(strides), tuple(map(tuple, padding)),
                          None if lhs_dilation is None else tuple(lhs_dilation),
                          dn)


def _epilogue(y, scale, shift, relu, dtype):
    if scale is not None:
        y = y * scale + shift
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(dtype)


def _pad_amounts(n: int, k: int, stride: int, convention: str) -> tuple:
    if convention == "TORCH":  # PyTorch Conv(padding=k//2)
        return (k // 2, k // 2)
    # flax/XLA SAME: out = ceil(n/s), asymmetric (lo = total//2).
    out = -(-n // stride)
    total = max((out - 1) * stride + k - n, 0)
    return (total // 2, total - total // 2)


def conv_folded(x, w, scale=None, shift=None, *, strides=1, relu=False,
                padding="SAME", out_dtype=None):
    """Lane-folded conv on NHWC/NDHWC input with fused affine(+ReLU) epilogue.

    w: (*spatial, C_in, C_out), odd kernel sizes; strides: int (uniform).
    padding: 'SAME' (flax/XLA asymmetric) or 'TORCH' (symmetric k//2 —
    PyTorch Conv(k, s, p=k//2) geometry). Falls back to the plain lax conv
    when the W extent doesn't fold. Differentiable; any dtype (bf16 hits the
    MXU fast path, accumulation is f32 either way).
    """
    sdims = w.ndim - 2
    stride = int(strides)
    c_in, c_out = int(w.shape[-2]), int(w.shape[-1])
    kw = int(w.shape[-3])
    f_in, f_out = fold_candidates(c_in, c_out, stride)
    wdim = int(x.shape[-2])
    lead_pads = [
        _pad_amounts(int(n), int(k), stride, padding)
        for n, k in zip(x.shape[-sdims - 1:-2], w.shape[:-3])
    ]
    w_plo = _pad_amounts(wdim, kw, stride, padding)[0]
    odt = out_dtype or x.dtype

    def viable(fi, fo):
        return (fi >= 2 and fo >= 1 and wdim % fi == 0
                and (stride * fo) % fi == 0 and stride * fo >= fi
                and (wdim // stride) % fo == 0)

    if not viable(f_in, f_out):
        # The tied fold doesn't divide this W extent (or no fold fits):
        # plain lax conv fallback, identical math.
        pads = lead_pads + [_pad_amounts(wdim, kw, stride, padding)]
        y = _conv(x, w, (stride,) * sdims, pads)
        return _epilogue(y, scale, shift, relu, odt)
    w_stride = stride * f_out // f_in
    xf = fold_width(x, f_in)
    wf, wpad = _fold_w(w, f_in, f_out, stride, w_plo)
    y = _conv(xf, wf, (stride,) * (sdims - 1) + (w_stride,),
              lead_pads + [wpad])
    s = b = None
    if scale is not None:
        s, b = jnp.tile(scale, f_out), jnp.tile(shift, f_out)
    return unfold_width(_epilogue(y, s, b, relu, odt), f_out)


def conv_transpose_folded2(x, w, scale=None, shift=None, *, relu=False,
                           out_dtype=None):
    """Transposed stride-2 conv (out = 2*in, flax ConvTranspose
    padding='SAME' geometry, kernel 3): leading spatial dims LHS-dilated by
    2; the W upsample is absorbed into the unfold (F_out = 2*F_in). Kernel
    layout (*spatial, C_in, C_out) like flax DHWIO."""
    c_in, c_out = int(w.shape[-2]), int(w.shape[-1])
    sdims = w.ndim - 2
    # F_out = 2*F_in with F_in*C_in <= 128 and F_out*C_out <= 128.
    f_in = _LANES // max(c_in, 2 * c_out)
    if f_in >= 1:
        f_in = 1 << (f_in.bit_length() - 1)
    f_out = 2 * f_in
    wdim = int(x.shape[-2])
    odt = out_dtype or x.dtype
    if f_in < 2 or wdim % max(f_in, 1) or int(w.shape[-3]) != 3:
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape,
            ("NDHWC", "DHWIO", "NDHWC") if x.ndim == 5
            else ("NHWC", "HWIO", "NHWC"))
        # preferred_element_type only when differentiable with it: the conv
        # transpose rule rejects f32 accumulation over bf16 operands (see
        # _conv_f32accum); the rare low-precision fallback rounds the conv
        # output instead.
        pet = {"preferred_element_type": jnp.float32} \
            if x.dtype == jnp.float32 else {}
        y = jax.lax.conv_transpose(
            x, w.astype(x.dtype), (2,) * sdims, "SAME",
            dimension_numbers=dn, **pet).astype(jnp.float32)
        return _epilogue(y, scale, shift, relu, odt)
    xf = fold_width(x, f_in)
    # out[w] = sum_dx W[dx] * in[(w + dx - 2)/2] (parity-matched): p_lo = 2.
    wf, wpad = _fold_w(w, f_in, f_out, 2, 2, transpose=True)
    # Leading dims: same relation over the lhs-dilated input needs pad_lo=2;
    # out = 2n fixes pad_hi = 1.
    pad = [(2, 1)] * (sdims - 1) + [wpad]
    dil = (2,) * (sdims - 1) + (1,)
    y = _conv(xf, wf, (1,) * sdims, pad, lhs_dilation=dil)
    s = b = None
    if scale is not None:
        s, b = jnp.tile(scale, f_out), jnp.tile(shift, f_out)
    return unfold_width(_epilogue(y, s, b, relu, odt), f_out)
