"""Pallas TPU kernel: banded fused plane-sweep variance volume.

This is the hand-scheduled form of ops.hat_warp.fused_variance_volume_banded
(same math, same coverage contract — see that module's docstring): the output
volume is tiled (tile_rows x tile_cols), each tile's source-image band is
DMA'd from HBM into VMEM, hat weights are built in VMEM, both interpolation
passes run as MXU matmuls, and the variance moments accumulate in VMEM
scratch across views — one kernel per output tile writes its (g, R, TW, C)
slot of the volume directly in volume layout.

What this removes relative to the XLA lax.map implementation (measured in
benchmarks/PERF_NOTES.md round-4 profile: warp+variance ~65% of the cascade
step):
  * per-iteration staging copies of loop carries and captured slices,
  * the stacked-output (N, g, R, TW, C) -> (D, H, W, C) transpose
    (tiles land in their final volume slots),
  * double materialization of hat weights through HBM — everything lives in
    VMEM for the duration of a tile.

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


def _hat(d):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _kernel(geom_ref, dep_ref, ref_ref, src_ref, out_ref,
            band, sem, xs_s, ys_s, vf_s, accf, accq, *,
            nv, h, w, g, tr, tc, bh, bw, cdt):
    num_views = nv + 1
    bi = pl.program_id(0)
    ri = pl.program_id(2)
    ci = pl.program_id(3)

    iota_r = jax.lax.broadcasted_iota(jnp.float32, (tr, tc), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.float32, (tr, tc), 1)
    py = iota_r + (ri * tr).astype(jnp.float32)
    px = iota_c + (ci * tc).astype(jnp.float32)
    in_img = (py < h) & (px < w)  # padded rows/cols masked out

    dep = dep_ref[0]  # (g, tr, tc) f32

    accf[...] = jnp.zeros_like(accf)
    accq[...] = jnp.zeros_like(accq)

    for v in range(nv):
        # Rotation rows + translation of src @ ref^-1, scalar reads from SMEM.
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
        okx = x_lo <= x_hi
        oky = y_lo <= y_hi
        cx = jnp.where(okx, 0.5 * (x_lo + x_hi), 0.0)
        cy = jnp.where(oky, 0.5 * (y_lo + y_hi), 0.0)
        x0 = jnp.clip(jnp.floor(cx - 0.5 * bw + 0.5), 0.0, float(w - bw)
                      ).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(cy - 0.5 * bh + 0.5), 0.0, float(h - bh)
                      ).astype(jnp.int32)

        slot = v % 2
        cp = pltpu.make_async_copy(
            src_ref.at[bi, v, pl.ds(y0, bh), pl.ds(x0, bw), :],
            band.at[slot], sem.at[slot])
        cp.start()

        # Band-relative coordinates into scratch (read back per plane).
        xs_s[...] = xs - x0.astype(jnp.float32)
        ys_s[...] = ys - y0.astype(jnp.float32)
        vf_s[...] = valid.astype(jnp.float32)

        cp.wait()
        bandv = band[slot].astype(cdt)  # (bh, bw, C)

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

            # Horizontal hats (tr, tc, bw): the residual-transport and the
            # horizontal interpolation pass share them.
            iota_bw3 = jax.lax.broadcasted_iota(jnp.float32, (tr, tc, bw), 2)
            hatx = (_hat(xs_p[:, :, None] - iota_bw3)
                    * vf[:, :, None]).astype(cdt)

            # Row-curve height at band columns: affine carrier + bf16 MXU
            # residual transport (batched over rows).
            rhs = jnp.stack([rho, vf], axis=-1).astype(cdt)  # (tr, tc, 2)
            nd = jax.lax.dot_general(
                hatx, rhs, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (tr, bw, 2)
            denom = nd[..., 1]
            corr = nd[..., 0] / jnp.maximum(denom, 1e-6)
            iota_bw2 = jax.lax.broadcasted_iota(jnp.float32, (tr, bw), 1)
            height = a[:, None] * iota_bw2 + c0[:, None] + corr
            covered = (denom > 1e-3).astype(jnp.float32)

            # Vertical pass: batched over band columns.
            iota_bh3 = jax.lax.broadcasted_iota(jnp.float32, (tr, bw, bh), 2)
            wv = (_hat(height[:, :, None] - iota_bh3)
                  * covered[:, :, None]).astype(cdt)  # (tr, bw, bh)
            tmp_t = jax.lax.dot_general(
                wv, bandv, (((2,), (0,)), ((1,), (1,))),
                preferred_element_type=jnp.float32)  # (bw, tr, C)

            # Horizontal pass: batched over rows (rhs batch at dim 1).
            out_p = jax.lax.dot_general(
                hatx, tmp_t.astype(cdt), (((2,), (0,)), ((0,), (1,))),
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


def _pad_to(x, axis, multiple):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, mode="edge")


def fused_variance_volume_pallas(
    ref_feat: jnp.ndarray,  # (B, H, W, C)
    src_feats: jnp.ndarray,  # (B, V, H, W, C)
    rel_projs: jnp.ndarray,  # (B, V, 4, 4) src @ ref^-1
    depth_values: jnp.ndarray,  # (B, D, H, W) per-pixel hypotheses
    tile_rows: int = 32,
    tile_cols: int = 128,
    band_h: int = 96,
    band_w: int = 192,
    depth_group: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Banded fused variance volume (B, D, H, W, C) as one Pallas program.

    Coverage contract identical to hat_warp.fused_variance_volume_banded:
    each (band_h, band_w) window must cover its tile's source footprint for
    the depth_group planes sharing it; in-image samples landing off-band
    contribute zero. Parity vs the XLA banded path is pinned in
    tests/test_warp_pallas.py.
    """
    b, h, w, c = ref_feat.shape
    nv = src_feats.shape[1]
    d = depth_values.shape[1]
    cdt = ref_feat.dtype

    band_h = min(band_h, h)
    band_w = min(band_w, w)
    tile_rows = min(tile_rows, h)
    tile_cols = min(tile_cols, w)
    if band_h < tile_rows or band_w < tile_cols:
        raise ValueError(
            f"band ({band_h}x{band_w}) smaller than tile ({tile_rows}x"
            f"{tile_cols})")
    if depth_group is None:
        depth_group = min(8, d)
    while d % depth_group:
        depth_group -= 1
    g = depth_group

    nr = -(-h // tile_rows)
    nc = -(-w // tile_cols)

    ref_pad = _pad_to(_pad_to(ref_feat, 1, tile_rows), 2, tile_cols)
    dep_pad = _pad_to(_pad_to(depth_values.astype(jnp.float32), 2, tile_rows),
                      3, tile_cols)
    geom = jnp.concatenate([
        rel_projs[:, :, :3, :3].reshape(b, nv, 9),
        rel_projs[:, :, :3, 3],
    ], axis=-1).astype(jnp.float32)  # (B, V, 12)

    hp, wp = nr * tile_rows, nc * tile_cols
    kernel = functools.partial(
        _kernel, nv=nv, h=h, w=w, g=g, tr=tile_rows, tc=tile_cols,
        bh=band_h, bw=band_w, cdt=cdt,
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
            pl.BlockSpec(memory_space=pltpu.ANY),   # src feats stay in HBM
        ],
        out_specs=pl.BlockSpec((1, g, tile_rows, tile_cols, c),
                               lambda bi, di, ri, ci: (bi, di, ri, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, hp, wp, c), cdt),
        scratch_shapes=[
            pltpu.VMEM((2, band_h, band_w, c), src_feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((g, tile_rows, tile_cols), jnp.float32),  # xs
            pltpu.VMEM((g, tile_rows, tile_cols), jnp.float32),  # ys
            pltpu.VMEM((g, tile_rows, tile_cols), jnp.float32),  # vf
            pltpu.VMEM((g, tile_rows, tile_cols, c), jnp.float32),  # accf
            pltpu.VMEM((g, tile_rows, tile_cols, c), jnp.float32),  # accq
        ],
        interpret=interpret,
    )(geom, dep_pad, ref_pad, src_feats)
    return out[:, :, :h, :w]
