"""Gather-free plane-sweep warping: bilinear resampling as hat-function matmuls.

Motivation: XLA row-gather on TPU runs at a few percent of HBM bandwidth
(measured ~31 ms to gather 12M x 32ch rows on v5e), making the classic
grid-sample formulation of plane-sweep warping (geometry/sampling.py) the
dominant cost of every MVS forward. The MXU, by contrast, is nearly free for
this problem size — so we recast interpolation as dense matmuls with
hat-function (tent) weight matrices built from iota comparisons, which needs
no gather/scatter at all.

Two-pass scheme, per depth hypothesis d and output row yo:
  1. The source-space sample locations of an output row lie (exactly, for a
     shared-depth plane: a homography maps lines to lines; approximately, for
     smooth per-pixel depth maps) along a curve y = h(x). We recover h at
     integer source columns by normalized-hat inverse interpolation of the
     (x_s, y_s) samples — a dense matvec.
  2. Vertical pass: tmp[x] = Σ_r hat(h(x) - r) · src[r, x]   (batched matmul)
  3. Horizontal pass: out[xo] = Σ_x hat(x_s(xo) - x) · tmp[x] (batched matmul)

The result samples the continuous bilinear interpolant along the row-curve;
it differs from per-pixel grid_sample by O(curve slope × within-cell feature
variation) — sub-percent for MVS view pairs (validated in
tests/test_hat_warp.py). Out-of-view samples produce zeros, matching
grid_sample(padding_mode='zeros').

Implementation notes (TPU):
  * work is chunked over (depth, output rows): weight tensors are bounded to
    a few hundred MB regardless of image size (an unchunked stage-3 vertical
    weight tensor would be ~14 GB and explodes XLA compile time);
  * hat weights are computed in f32 (coordinate precision) and stored/bf16-
    multiplied on the MXU;
  * the fused variant accumulates variance moments across all source views
    inside the chunk loop — per-view warped volumes never exist in HBM.

Reference semantics being replaced: MVSNet/models/module.py:46-87 (and the
five per-pipeline copies of it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvs_tpu.geometry.homography import plane_sweep_coords

__all__ = ["two_pass_warp", "warp_src_feature_hat", "fused_variance_volume_hat"]


def _hat(dist):
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def _warp_rows(src, coords, iota_x, iota_r, wdtype):
    """Two-pass hat warp of a row-chunk. src (H, W, C); coords (R, Wo, 2)
    (R = chunked rows, possibly multiple depth planes' rows flattened)
    -> (R, Wo, C)."""
    h, w, c = src.shape
    cdtype = src.dtype
    xs = coords[..., 0]  # (R, Wo)
    ys = coords[..., 1]
    valid = (xs > -1.0) & (xs < w) & (ys > -1.0) & (ys < h)
    vf = valid.astype(jnp.float32)

    # 1. row-curve height at integer source columns (normalized inverse hats).
    hat_inv = _hat(xs[..., None] - iota_x) * vf[..., None]  # (R, Wo, W)
    denom = jnp.sum(hat_inv, axis=-2)  # (R, W)
    height = jnp.einsum("rox,ro->rx", hat_inv, ys) / jnp.maximum(denom, 1e-6)
    covered = (denom > 1e-6).astype(jnp.float32)

    # 2. vertical pass (contract source rows).
    wv = (_hat(height[..., None] - iota_r) * covered[..., None]).astype(wdtype)
    tmp = jnp.einsum("rxh,hxc->rxc", wv, src.astype(wdtype),
                     preferred_element_type=jnp.float32)  # (R, W, C)

    # 3. horizontal pass (contract source columns).
    wh = (hat_inv).astype(wdtype)  # same hats, reused
    out = jnp.einsum("rox,rxc->roc", wh, tmp.astype(wdtype),
                     preferred_element_type=jnp.float32)
    return out.astype(cdtype)


def _chunk_coords(coords, rows_per_chunk):
    """coords (D, Ho, Wo, 2) -> (n_chunks, rows_per_chunk, Wo, 2) + total rows."""
    d, ho, wo, _ = coords.shape
    flat = coords.reshape(d * ho, wo, 2)
    total = d * ho
    pad = (-total) % rows_per_chunk
    flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0)))
    return flat.reshape(-1, rows_per_chunk, wo, 2), total


def two_pass_warp(src: jnp.ndarray, coords: jnp.ndarray,
                  rows_per_chunk: int = 256) -> jnp.ndarray:
    """Warp src (H, W, C) at coords (D, Ho, Wo, 2) -> (D, Ho, Wo, C)."""
    h, w, c = src.shape
    d, ho, wo, _ = coords.shape
    # Weights/matmuls run in the feature dtype: bf16 features (the model's
    # compute_dtype on TPU) hit the MXU fast path; f32 features stay exact.
    wdtype = src.dtype
    iota_x = jnp.arange(w, dtype=jnp.float32)
    iota_r = jnp.arange(h, dtype=jnp.float32)

    chunks, total = _chunk_coords(coords, rows_per_chunk)
    out = jax.lax.map(
        lambda ch: _warp_rows(src, ch, iota_x, iota_r, wdtype), chunks
    )
    return out.reshape(-1, wo, c)[:total].reshape(d, ho, wo, c)


def warp_src_feature_hat(src_feat: jnp.ndarray, rel_proj: jnp.ndarray,
                         depth_values: jnp.ndarray,
                         rows_per_chunk: int = 256) -> jnp.ndarray:
    """Drop-in fast replacement for geometry.homography.warp_src_feature."""
    h, w, _ = src_feat.shape
    coords = plane_sweep_coords(rel_proj, depth_values, h, w)
    return two_pass_warp(src_feat, coords, rows_per_chunk=rows_per_chunk)


def fused_variance_volume_hat(
    ref_feat: jnp.ndarray,  # (H, W, C)
    src_feats: jnp.ndarray,  # (V, H, W, C)
    rel_projs: jnp.ndarray,  # (V, 4, 4)
    depth_values: jnp.ndarray,  # (D,) or (D, H, W)
    rows_per_chunk: int = 256,
) -> jnp.ndarray:
    """Fused plane-sweep: hat-warp every view AND accumulate the variance
    moments inside one row-chunk loop (never materializing per-view volumes
    — the reference's in-place Σ/Σ² trick, MVSNet/models/mvsnet.py:156-170,
    taken to its fused conclusion)."""
    h, w, c = ref_feat.shape
    nv = src_feats.shape[0]
    num_views = nv + 1
    d = depth_values.shape[0]
    wdtype = src_feats.dtype

    iota_x = jnp.arange(w, dtype=jnp.float32)
    iota_r = jnp.arange(h, dtype=jnp.float32)

    per_view = []
    total = d * h
    for v in range(nv):
        coords = plane_sweep_coords(rel_projs[v], depth_values, h, w)
        chunks, total = _chunk_coords(coords, rows_per_chunk)
        per_view.append(chunks)
    all_chunks = jnp.stack(per_view, axis=1)  # (n_chunks, V, R, Wo, 2)

    def chunk_fn(chunk_coords):  # (V, R, Wo, 2)
        sum_f = jnp.zeros((rows_per_chunk, w, c), jnp.float32)
        sum_sq = jnp.zeros_like(sum_f)
        for v in range(nv):
            warped = _warp_rows(src_feats[v], chunk_coords[v], iota_x, iota_r,
                                wdtype).astype(jnp.float32)
            sum_f = sum_f + warped
            sum_sq = sum_sq + warped * warped
        return sum_f, sum_sq

    sum_f, sum_sq = jax.lax.map(chunk_fn, all_chunks)
    sum_f = sum_f.reshape(-1, w, c)[:total].reshape(d, h, w, c)
    sum_sq = sum_sq.reshape(-1, w, c)[:total].reshape(d, h, w, c)
    ref_volume = ref_feat[None].astype(jnp.float32)
    sum_f = sum_f + ref_volume
    sum_sq = sum_sq + ref_volume * ref_volume
    mean = sum_f / num_views
    return (sum_sq / num_views - mean * mean).astype(ref_feat.dtype)
