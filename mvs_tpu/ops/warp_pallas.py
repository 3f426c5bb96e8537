"""Pallas TPU kernel: banded fused plane-sweep variance volume.

This is the hand-scheduled form of ops.hat_warp.fused_variance_volume_banded
(same math, same coverage contract — see that module's docstring): the output
volume is tiled (tile_rows x tile_cols), each tile's source-image band is
DMA'd from HBM into VMEM, hat weights are built in VMEM, both interpolation
passes run as MXU matmuls, and the variance moments accumulate in VMEM
scratch across views — one kernel invocation per output tile writes its
(g, R, TW, C) slot of the volume directly in volume layout.

What this removes relative to the XLA lax.map implementation (measured in
benchmarks/PERF_NOTES.md round-4 profile: warp+variance ~65% of the cascade
step): per-iteration staging copies of loop carries, the stacked-output
(N, g, R, TW, C) -> (D, H, W, C) transpose, and HBM round-trips of the hat
weights — everything lives in VMEM for the duration of a tile.

Mosaic constraints shape the layout (all probed on the v5e):
  * sliced DMA works only on 2D refs, with lane starts/sizes multiples of
    128 and sublane starts multiples of 8 -> the source stack is passed as
    (B*V*W*C, Hp) with H in lanes (Hp padded to 128) and (x, c) in rows; a
    band is ONE 2D DMA of (BW*C, BH) rows x0*C..(x0+BW)*C (any x0: C >= 8
    keeps row starts 8-aligned), cols y0..y0+BH with y0 128-aligned and
    BH = 256 (guaranteed to cover any <=128-px vertical span after
    round-to-nearest-128 snapping).
  * batched dot_general requires batch dims LEADING on both operands ->
    vertical pass batches over band columns with the band reshaped
    (BW, C, BH) (sublane split: free), horizontal pass batches over rows
    after a (bw, tr, C) -> (tr, bw, C) swapaxes (supported; lanes
    untouched).
  * iota must be integer-typed (cast to f32 after).

Semantics replaced (at speed): reference MVSNet/models/module.py:46-87
homography warp + MVSNet/models/mvsnet.py:156-170 in-place variance, with
per-pixel depth hypotheses (CasMVSNet/models/module.py:245-280).

The op takes an explicit batch dim (vmap over pallas_call with an ANY-space
operand is not legal — Mosaic rejects the batched BlockSpec; batch rides the
grid instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_variance_volume_pallas"]

_LANE = 128


def _hat(d):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _fiota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _kernel(geom_ref, dep_ref, ref_ref, src_ref, out_ref,
            band, sem, xs_s, ys_s, vf_s, accf, accq, *,
            nv, h, w, hpad, wfull, g, tr, tc, bh, bw, cdt):
    """One (batch, depth-group, tile-row, tile-col) grid step.

    src_ref: (B*V*W*C, Hp) 2D HBM view of the (B, V, W, C, Hp) source stack.
    """
    num_views = nv + 1
    bi = pl.program_id(0)
    ri = pl.program_id(2)
    ci = pl.program_id(3)
    c = accf.shape[-1]

    py = _fiota((tr, tc), 0) + (ri * tr).astype(jnp.float32)
    px = _fiota((tr, tc), 1) + (ci * tc).astype(jnp.float32)
    in_img = (py < h) & (px < w)  # padded rows/cols masked out

    dep = dep_ref[0]  # (g, tr, tc) f32

    accf[...] = jnp.zeros_like(accf)
    accq[...] = jnp.zeros_like(accq)

    for v in range(nv):
        # Rotation rows + translation of src @ ref^-1, scalars from SMEM.
        gv = [geom_ref[bi, v, k] for k in range(12)]
        rx = gv[0] * px + gv[1] * py + gv[2]
        ry = gv[3] * px + gv[4] * py + gv[5]
        rz = gv[6] * px + gv[7] * py + gv[8]
        # Arithmetic order matches geometry.homography.plane_sweep_coords
        # (rotate, then mul-add depth/translation) so all samplers share f32
        # rounding.
        qx = rx[None] * dep + gv[9]
        qy = ry[None] * dep + gv[10]
        qz = rz[None] * dep + gv[11]
        pos = qz > 1e-3
        safez = jnp.where(pos, qz, 1.0)
        xs = jnp.where(pos, qx / safez, -2.0 * w)
        ys = jnp.where(pos, qy / safez, -2.0 * h)
        valid = (pos & (xs > -1.0) & (xs < w) & (ys > -1.0) & (ys < h)
                 & in_img[None])

        # Band window over all g planes (depth_group semantics: consecutive
        # cascade planes are nearly coincident, one window covers them).
        big = jnp.float32(1e9)
        x_lo = jnp.min(jnp.where(valid, xs, big))
        x_hi = jnp.max(jnp.where(valid, xs, -big))
        y_lo = jnp.min(jnp.where(valid, ys, big))
        y_hi = jnp.max(jnp.where(valid, ys, -big))
        cx = jnp.where(x_lo <= x_hi, 0.5 * (x_lo + x_hi), 0.0)
        cy = jnp.where(y_lo <= y_hi, 0.5 * (y_lo + y_hi), 0.0)
        # x start: any int (row starts are x0*C, C>=8 keeps them 8-aligned).
        x0 = jnp.clip(jnp.floor(cx - 0.5 * bw + 0.5), 0.0,
                      float(wfull - bw)).astype(jnp.int32)
        # y start: snapped to the nearest 128 (lane alignment); BH - 128 of
        # span budget survives the snap. hpad and bh are multiples of 128 so
        # the clip bound hpad - bh stays aligned.
        y0f = jnp.clip(cy - 0.5 * bh, 0.0, float(hpad - bh))
        y0 = (_LANE * jnp.floor(y0f / _LANE + 0.5)).astype(jnp.int32)
        y0 = jnp.clip(y0, 0, hpad - bh)

        slot = v % 2
        row0 = ((bi * nv + v) * wfull + x0) * c
        # multiple_of: Mosaic must PROVE slice starts hit the (8, 128) tile
        # grid; the arithmetic above guarantees it (y0 = 128*floor, row0 a
        # multiple of C >= 8) but the prover needs the hint.
        row0 = pl.multiple_of(row0, 8)
        y0 = pl.multiple_of(y0, _LANE)
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(row0, bw * c), pl.ds(y0, bh)],
            band.at[slot], sem.at[slot])
        cp.start()

        # Band-relative coordinates into scratch (read back per plane).
        xs_s[...] = xs - x0.astype(jnp.float32)
        ys_s[...] = ys - y0.astype(jnp.float32)
        vf_s[...] = valid.astype(jnp.float32)

        cp.wait()
        band3 = band[slot].reshape(bw, c, bh).astype(cdt)  # sublane split

        def plane(p, _):
            xs_p = xs_s[p]  # (tr, tc)
            ys_p = ys_s[p]
            vf = vf_s[p]

            # Centered per-row affine fit (see hat_warp._row_affine_fit).
            sw = jnp.sum(vf, axis=-1)
            safe_sw = jnp.maximum(sw, 1e-6)
            mx = jnp.sum(vf * xs_p, axis=-1) / safe_sw
            my = jnp.sum(vf * ys_p, axis=-1) / safe_sw
            dx = xs_p - mx[:, None]
            dy = ys_p - my[:, None]
            sxx = jnp.sum(vf * dx * dx, axis=-1)
            sxy = jnp.sum(vf * dx * dy, axis=-1)
            ok = (sw >= 2.0) & (sxx > 1e-3 * safe_sw)
            a = jnp.where(ok, sxy / jnp.where(ok, sxx, 1.0), 0.0)
            c0 = my - a * mx
            rho = (ys_p - (a[:, None] * xs_p + c0[:, None])) * vf

            # Horizontal hats (tr, tc, bw): shared by the residual transport
            # and the horizontal interpolation pass. Keep the f32 build
            # around: the height pass reduces it directly.
            hat32 = (_hat(xs_p[:, :, None] - _fiota((tr, tc, bw), 2))
                     * vf[:, :, None])
            hatx = hat32.astype(cdt)

            # Row-curve height at band columns: affine carrier + residual
            # transport. As VPU reductions, not a matmul — the (.., 2)-wide
            # batched dot wasted >98% of the MXU and was the single most
            # expensive op of the kernel (ablation: ~1/3 of kernel time).
            # vf is already folded into hat32, so denom is a plain sum.
            denom = jnp.sum(hat32, axis=1)  # (tr, bw)
            num = jnp.sum(hat32 * rho[:, :, None], axis=1)
            corr = num / jnp.maximum(denom, 1e-6)
            height = a[:, None] * _fiota((tr, bw), 1) + c0[:, None] + corr
            covered = (denom > 1e-3).astype(jnp.float32)

            # Vertical pass, batched over band columns: both operands need
            # the batch dim LEADING, so transpose the (tr, bw) height/cover
            # maps (2D transpose; cheap at these sizes).
            height_t = height.T  # (bw, tr)
            covered_t = covered.T
            wv_t = (_hat(height_t[:, :, None] - _fiota((bw, tr, bh), 2))
                    * covered_t[:, :, None]).astype(cdt)  # (bw, tr, bh)
            tmp_t = jax.lax.dot_general(
                wv_t, band3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (bw, tr, C)

            # Horizontal pass, batched over rows.
            tmp = jnp.swapaxes(tmp_t, 0, 1).astype(cdt)  # (tr, bw, C)
            out_p = jax.lax.dot_general(
                hatx, tmp, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (tr, tc, C)

            accf[p] += out_p
            accq[p] += out_p * out_p
            return 0

        jax.lax.fori_loop(0, g, plane, 0)

    ref_tile = ref_ref[0].astype(jnp.float32)  # (tr, tc, C)
    sum_f = accf[...] + ref_tile[None]
    sum_sq = accq[...] + (ref_tile * ref_tile)[None]
    mean = sum_f / num_views
    out_ref[0] = (sum_sq / num_views - mean * mean).astype(out_ref.dtype)


def _pad_axis(x, axis, multiple, value=None):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    if value is None:
        return jnp.pad(x, widths, mode="edge")
    return jnp.pad(x, widths, constant_values=value)


def fused_variance_volume_pallas(
    ref_feat: jnp.ndarray,  # (B, H, W, C)
    src_feats: jnp.ndarray,  # (B, V, H, W, C)
    rel_projs: jnp.ndarray,  # (B, V, 4, 4) src @ ref^-1
    depth_values: jnp.ndarray,  # (B, D, H, W) per-pixel hypotheses
    tile_rows: int = 32,
    tile_cols: int = 128,
    band_h: int = 256,
    band_w: int = 192,
    depth_group: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Banded fused variance volume (B, D, H, W, C) as one Pallas program.

    Coverage contract as in hat_warp.fused_variance_volume_banded, with
    band_h quantized to a multiple of 128 (lane-aligned DMA): the effective
    vertical span budget is band_h - 128 (after nearest-128 window
    snapping), horizontal budget band_w - tile_cols. Parity vs the XLA
    banded path and the gather sampler is pinned in
    tests/test_warp_pallas.py.
    """
    b, h, w, c = ref_feat.shape
    nv = src_feats.shape[1]
    d = depth_values.shape[1]
    cdt = ref_feat.dtype

    band_w = min(band_w, w)
    tile_rows = min(tile_rows, h)
    tile_cols = min(tile_cols, w)
    # Lane-aligned vertical band: multiple of 128 covering H if H is small.
    band_h = min(band_h, -(-h // _LANE) * _LANE)
    band_h = max(_LANE, (band_h // _LANE) * _LANE)
    if band_w < tile_cols:
        raise ValueError(f"band_w {band_w} < tile_cols {tile_cols}")
    if depth_group is None:
        depth_group = min(8, d)
    while d % depth_group:
        depth_group -= 1
    g = depth_group

    nr = -(-h // tile_rows)
    nc = -(-w // tile_cols)
    hp, wp = nr * tile_rows, nc * tile_cols

    ref_pad = _pad_axis(_pad_axis(ref_feat, 1, tile_rows), 2, tile_cols)
    dep_pad = _pad_axis(
        _pad_axis(depth_values.astype(jnp.float32), 2, tile_rows),
        3, tile_cols)
    geom = jnp.concatenate([
        rel_projs[:, :, :3, :3].reshape(b, nv, 9),
        rel_projs[:, :, :3, 3],
    ], axis=-1).astype(jnp.float32)  # (B, V, 12)

    # Source stack as (B*V*W*C, Hp): H zero-padded to a lane multiple (zero
    # rows beyond H-1 reproduce grid_sample's zero extension for edge hats),
    # then W-major/channel-minor rows so a band is one 2D DMA.
    hpad = max(-(-h // _LANE) * _LANE, band_h)
    src_t = jnp.moveaxis(src_feats, 2, 4)  # (B, V, W, C, H)
    if hpad > h:
        src_t = jnp.pad(src_t, [(0, 0)] * 4 + [(0, hpad - h)],
                        constant_values=0.0)
    src2d = src_t.reshape(b * nv * w * c, hpad)

    kernel = functools.partial(
        _kernel, nv=nv, h=h, w=w, hpad=hpad, wfull=w, g=g, tr=tile_rows,
        tc=tile_cols, bh=band_h, bw=band_w, cdt=cdt,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, d // g, nr, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # geom (B, V, 12)
            pl.BlockSpec((1, g, tile_rows, tile_cols),
                         lambda bi, di, ri, ci: (bi, di, ri, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows, tile_cols, c),
                         lambda bi, di, ri, ci: (bi, ri, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # src2d pinned to HBM
            # (ANY may place it in VMEM, whose dynamic slicing Mosaic rejects)
        ],
        out_specs=pl.BlockSpec((1, g, tile_rows, tile_cols, c),
                               lambda bi, di, ri, ci: (bi, di, ri, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, hp, wp, c), cdt),
        scratch_shapes=[
            pltpu.VMEM((2, band_w * c, band_h), src_feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((g, tile_rows, tile_cols), jnp.float32),  # xs
            pltpu.VMEM((g, tile_rows, tile_cols), jnp.float32),  # ys
            pltpu.VMEM((g, tile_rows, tile_cols), jnp.float32),  # vf
            pltpu.VMEM((g, tile_rows, tile_cols, c), jnp.float32),  # accf
            pltpu.VMEM((g, tile_rows, tile_cols, c), jnp.float32),  # accq
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(geom, dep_pad, ref_pad, src2d)
    return out[:, :, :h, :w]
