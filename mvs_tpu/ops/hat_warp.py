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

Reference semantics being replaced: MVSNet/models/module.py:46-87 (and the
five per-pipeline copies of it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvs_tpu.geometry.homography import plane_sweep_coords

__all__ = ["two_pass_warp", "warp_src_feature_hat"]


def _hat(dist):
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def two_pass_warp(src: jnp.ndarray, coords: jnp.ndarray,
                  depth_chunk: int = 4) -> jnp.ndarray:
    """Warp src (H, W, C) at coords (D, Ho, Wo, 2) -> (D, Ho, Wo, C).

    Matmul-only; `depth_chunk` depth planes are processed per loop step to
    amortize weight construction while bounding live weight memory.
    """
    h, w, c = src.shape
    d, ho, wo, _ = coords.shape
    cdtype = src.dtype

    iota_x = jnp.arange(w, dtype=jnp.float32)  # source columns
    iota_r = jnp.arange(h, dtype=jnp.float32)  # source rows

    pad_d = (-d) % depth_chunk
    coords_p = jnp.pad(coords, ((0, pad_d), (0, 0), (0, 0), (0, 0)))
    chunks = coords_p.reshape(-1, depth_chunk, ho, wo, 2)

    def chunk_fn(chunk):  # (dc, Ho, Wo, 2)
        xs = chunk[..., 0]  # (dc, Ho, Wo)
        ys = chunk[..., 1]
        valid = (xs > -1.0) & (xs < w) & (ys > -1.0) & (ys < h)
        vf = valid.astype(jnp.float32)

        # --- 1. row-curve height h(x) at integer source columns ---
        # hat_inv[..., o, x] = hat(x_s(o) - x), masked to valid samples.
        hat_inv = _hat(xs[..., None] - iota_x) * vf[..., None]  # (dc,Ho,Wo,W)
        denom = jnp.sum(hat_inv, axis=-2)  # (dc, Ho, W)
        height = jnp.einsum("dyox,dyo->dyx", hat_inv, ys)
        height = height / jnp.maximum(denom, 1e-6)  # (dc, Ho, W)
        covered = denom > 1e-6

        # --- 2. vertical pass: tmp[x] = Σ_r hat(h(x) - r) src[r, x] ---
        wv = _hat(height[..., None] - iota_r)  # (dc, Ho, W, H)
        wv = wv * covered[..., None].astype(jnp.float32)
        tmp = jnp.einsum(
            "dyxr,rxc->dyxc", wv.astype(cdtype), src,
            preferred_element_type=jnp.float32,
        )  # (dc, Ho, W, C)

        # --- 3. horizontal pass: out[xo] = Σ_x hat(x_s(xo) - x) tmp[x] ---
        wh = _hat(xs[..., None] - iota_x) * vf[..., None]  # (dc, Ho, Wo, W)
        out = jnp.einsum(
            "dyox,dyxc->dyoc", wh.astype(cdtype), tmp.astype(cdtype),
            preferred_element_type=jnp.float32,
        )
        return out.astype(cdtype)

    out = jax.lax.map(chunk_fn, chunks)  # (n_chunks, dc, Ho, Wo, C)
    return out.reshape(-1, ho, wo, c)[:d]


def warp_src_feature_hat(src_feat: jnp.ndarray, rel_proj: jnp.ndarray,
                         depth_values: jnp.ndarray,
                         depth_chunk: int = 4) -> jnp.ndarray:
    """Drop-in fast replacement for geometry.homography.warp_src_feature."""
    h, w, _ = src_feat.shape
    coords = plane_sweep_coords(rel_proj, depth_values, h, w)
    return two_pass_warp(src_feat, coords, depth_chunk=depth_chunk)


def _warp_chunk(src, chunk, iota_x, iota_r):
    """Two-pass hat warp of one depth chunk. src (H, W, C); chunk
    (dc, Ho, Wo, 2) -> (dc, Ho, Wo, C)."""
    h, w, c = src.shape
    cdtype = src.dtype
    xs = chunk[..., 0]
    ys = chunk[..., 1]
    valid = (xs > -1.0) & (xs < w) & (ys > -1.0) & (ys < h)
    vf = valid.astype(jnp.float32)

    hat_inv = _hat(xs[..., None] - iota_x) * vf[..., None]  # (dc,Ho,Wo,W)
    denom = jnp.sum(hat_inv, axis=-2)  # (dc, Ho, W)
    height = jnp.einsum("dyox,dyo->dyx", hat_inv, ys)
    height = height / jnp.maximum(denom, 1e-6)
    covered = denom > 1e-6

    wv = _hat(height[..., None] - iota_r)  # (dc, Ho, W, H)
    wv = wv * covered[..., None].astype(jnp.float32)
    tmp = jnp.einsum("dyxr,rxc->dyxc", wv.astype(cdtype), src,
                     preferred_element_type=jnp.float32)

    wh = _hat(xs[..., None] - iota_x) * vf[..., None]
    out = jnp.einsum("dyox,dyxc->dyoc", wh.astype(cdtype),
                     tmp.astype(cdtype), preferred_element_type=jnp.float32)
    return out.astype(cdtype)


def fused_variance_volume_hat(
    ref_feat: jnp.ndarray,  # (H, W, C)
    src_feats: jnp.ndarray,  # (V, H, W, C)
    rel_projs: jnp.ndarray,  # (V, 4, 4)
    depth_values: jnp.ndarray,  # (D,) or (D, H, W)
    depth_chunk: int = 4,
) -> jnp.ndarray:
    """Fused plane-sweep: hat-warp every view AND accumulate the variance
    moments inside one depth-chunk loop (never materializing per-view volumes
    — the reference's in-place Σ/Σ² trick, MVSNet/models/mvsnet.py:156-170,
    taken to its fused conclusion). One loop body total per stage instead of
    one warp program per view keeps XLA compile time flat in V."""
    h, w, c = ref_feat.shape
    nv = src_feats.shape[0]
    num_views = nv + 1
    d = depth_values.shape[0]

    coords = jnp.stack([
        plane_sweep_coords(rel_projs[v], depth_values, h, w) for v in range(nv)
    ], axis=0)  # (V, D, Ho, Wo, 2)

    iota_x = jnp.arange(w, dtype=jnp.float32)
    iota_r = jnp.arange(h, dtype=jnp.float32)

    pad_d = (-d) % depth_chunk
    coords_p = jnp.pad(coords, ((0, 0), (0, pad_d), (0, 0), (0, 0), (0, 0)))
    # (n_chunks, V, dc, Ho, Wo, 2)
    chunks = jnp.moveaxis(
        coords_p.reshape(nv, -1, depth_chunk, h, w, 2), 0, 1
    )

    def chunk_fn(chunk_coords):  # (V, dc, Ho, Wo, 2)
        sum_f = jnp.zeros((depth_chunk, h, w, c), jnp.float32)
        sum_sq = jnp.zeros_like(sum_f)
        for v in range(nv):
            warped = _warp_chunk(src_feats[v], chunk_coords[v], iota_x, iota_r)
            warped = warped.astype(jnp.float32)
            sum_f = sum_f + warped
            sum_sq = sum_sq + warped * warped
        return sum_f, sum_sq

    sum_f, sum_sq = jax.lax.map(chunk_fn, chunks)
    sum_f = sum_f.reshape(-1, h, w, c)[:d]
    sum_sq = sum_sq.reshape(-1, h, w, c)[:d]
    ref_volume = ref_feat[None].astype(jnp.float32)
    sum_f = sum_f + ref_volume
    sum_sq = sum_sq + ref_volume * ref_volume
    mean = sum_f / num_views
    return (sum_sq / num_views - mean * mean).astype(ref_feat.dtype)
