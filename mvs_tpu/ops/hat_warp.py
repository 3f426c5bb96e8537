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

__all__ = [
    "two_pass_warp",
    "warp_src_feature_hat",
    "fused_variance_volume_hat",
    "fused_variance_volume_banded",
]


def _hat(dist):
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def _row_affine_fit(xs, ys, vf):
    """Per-row weighted least-squares line ys ~ a*xs + c over valid samples.

    xs/ys/vf (..., N) -> a, c with trailing dim reduced. All f32, O(N) —
    replaces the O(N*W) HIGHEST-precision inverse-hat interpolation as the
    carrier of the (large) absolute row coordinate; the interpolation then
    only transports the (small) residual, where bf16 MXU matmuls are
    effectively exact (8-bit-mantissa products accumulate in f32 without
    rounding, so the only error is the 2^-9 input quantization of a
    few-pixel residual ~ 1e-2 px).
    """
    # Center at the weighted means before forming the normal equations: with
    # raw absolute coordinates (up to W~1152) det = sw*swxx - swx^2 cancels
    # catastrophically in f32 when the valid samples cluster far from x=0.
    # Centered, the "det" is sw * sum(vf*dx^2) — a pure positive sum, no
    # cancellation — and the degeneracy test becomes scale-free (weighted
    # rms x-spread below ~0.03 px => treat as a horizontal line).
    sw = jnp.sum(vf, axis=-1)
    safe_sw = jnp.maximum(sw, 1e-6)
    mx = jnp.sum(vf * xs, axis=-1) / safe_sw
    my = jnp.sum(vf * ys, axis=-1) / safe_sw
    dx = xs - mx[..., None]
    dy = ys - my[..., None]
    sxx = jnp.sum(vf * dx * dx, axis=-1)
    sxy = jnp.sum(vf * dx * dy, axis=-1)
    # Degenerate rows (<2 valid samples, or all samples at ~one x): a=0 —
    # horizontal line through the weighted mean; fully invalid rows are
    # masked by callers anyway.
    ok = (sw >= 2.0) & (sxx > 1e-3 * safe_sw)
    a = jnp.where(ok, sxy / jnp.where(ok, sxx, 1.0), 0.0)
    c = my - a * mx
    return a, c


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

    # 1. row-curve height at integer source columns. A per-row affine fit
    # (f32, O(Wo)) carries the absolute row coordinate — exact for shared-
    # depth planes, whose rows map to exact lines under the homography — and
    # the hats transport only the small residual via one bf16 MXU matmul
    # (see _row_affine_fit). This replaces the HIGHEST-precision f32 einsum
    # that dominated the warp's device time.
    a, cc = _row_affine_fit(xs, ys, vf)  # (R,), (R,)
    rho = (ys - (a[:, None] * xs + cc[:, None])) * vf  # (R, Wo) small
    hat_b = (_hat(xs[..., None] - iota_x) * vf[..., None]).astype(wdtype)
    rhs = jnp.stack([rho, vf], axis=-1).astype(wdtype)  # (R, Wo, 2)
    nd = jnp.einsum("rox,rot->rxt", hat_b, rhs,
                    preferred_element_type=jnp.float32)  # (R, W, 2)
    denom = nd[..., 1]
    corr = nd[..., 0] / jnp.maximum(denom, 1e-6)
    height = a[:, None] * iota_x[None, :] + cc[:, None] + corr  # (R, W)
    covered = (denom > 1e-3).astype(jnp.float32)

    # 2. vertical pass (contract source rows).
    wv = (_hat(height[..., None] - iota_r) * covered[..., None]).astype(wdtype)
    tmp = jnp.einsum("rxh,hxc->rxc", wv, src.astype(wdtype),
                     preferred_element_type=jnp.float32)  # (R, W, C)

    # 3. horizontal pass (contract source columns, same hats reused).
    out = jnp.einsum("rox,rxc->roc", hat_b, tmp.astype(wdtype),
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

    total = d * h
    n_chunks = -(-total // rows_per_chunk)
    pad_rows = n_chunks * rows_per_chunk - total
    # Chunk i covers flat rows [i*R, i*R+R) of the (D*H) plane-major row
    # space: image row = flat % H, plane = flat // H. Coordinates are
    # computed INSIDE the loop from (rows, depth) — precomputing a
    # (D*H, V, W, 2) coords array cost ~50 MB of HBM round-trips plus
    # per-iteration staging copies at CasMVSNet stage 1. Arithmetic order
    # matches geometry.homography.plane_sweep_coords exactly (einsum then
    # mul-add) so all sampler paths share f32 rounding.
    flat = jnp.arange(n_chunks * rows_per_chunk, dtype=jnp.int32)
    row_idx = (flat % h).reshape(n_chunks, rows_per_chunk)
    if depth_values.ndim == 1:
        dep_flat = jnp.broadcast_to(depth_values[:, None], (d, h)).reshape(-1)
        dep_flat = jnp.pad(dep_flat, (0, pad_rows))
        dep_chunks = dep_flat.reshape(n_chunks, rows_per_chunk)[..., None]
    else:  # (D, H, W) per-pixel hypotheses
        dep_flat = depth_values.reshape(d * h, w)
        dep_flat = jnp.pad(dep_flat, ((0, pad_rows), (0, 0)))
        dep_chunks = dep_flat.reshape(n_chunks, rows_per_chunk, w)

    rots = rel_projs[:, :3, :3]
    transes = rel_projs[:, :3, 3]
    # Hoisted per-view slices: indexing src_feats[v] inside chunk_fn makes
    # XLA re-materialize every view's full feature map per while iteration.
    src_list = [src_feats[v] for v in range(nv)]

    def chunk_fn(args):
        rows, dep = args  # (R,), (R, 1|W)
        grid = jnp.stack([
            jnp.broadcast_to(iota_x[None, :], (rows_per_chunk, w)),
            jnp.broadcast_to(rows.astype(jnp.float32)[:, None],
                             (rows_per_chunk, w)),
            jnp.ones((rows_per_chunk, w), jnp.float32),
        ])  # (3, R, W)
        depb = jnp.broadcast_to(dep, (rows_per_chunk, w))
        ref_rows_f = jnp.take(ref_feat, rows, axis=0).astype(jnp.float32)
        sum_f = ref_rows_f
        sum_sq = ref_rows_f * ref_rows_f
        for v in range(nv):
            rot_xyz = jnp.einsum("ij,jrw->irw", rots[v], grid)
            q = rot_xyz * depb[None] + transes[v][:, None, None]
            qz = q[2]
            pos = qz > 1e-3
            safe_z = jnp.where(pos, qz, 1.0)
            xs = jnp.where(pos, q[0] / safe_z, -2.0 * w)
            ys = jnp.where(pos, q[1] / safe_z, -2.0 * h)
            warped = _warp_rows(src_list[v], jnp.stack([xs, ys], -1),
                                iota_x, iota_r, wdtype).astype(jnp.float32)
            sum_f = sum_f + warped
            sum_sq = sum_sq + warped * warped
        # Variance computed in-loop: the loop emits the bf16 volume directly
        # instead of carrying two full-size f32 moment stacks through HBM.
        mean = sum_f / num_views
        return (sum_sq / num_views - mean * mean).astype(ref_feat.dtype)

    # Per-chunk remat: lax.map's VJP stores every iteration's residuals
    # (hat weights, warped rows) — tens of GB at train shapes. Checkpointing
    # the BODY makes the backward recompute each chunk from its (tiny)
    # inputs instead; measured 69.8 GB -> fits-in-HBM at 640x512 training.
    var = jax.lax.map(jax.checkpoint(chunk_fn), (row_idx, dep_chunks))
    return var.reshape(-1, w, c)[:total].reshape(d, h, w, c)


# ---------------------------------------------------------------------------
# Banded tiled variant: the production TPU path.
#
# The dense two-pass above contracts the vertical pass over ALL H source rows
# and the horizontal pass over ALL W source columns, even though the hat
# weights have 2-tap support: for MVS view pairs the samples of an output
# tile live in a small source-image window. This variant tiles the output
# into (plane-group, tile_rows, tile_cols) blocks, locates each tile's source
# window (a scalar min/max of the sample coordinates), dynamic-slices just
# that (band_h, band_w) window, and runs both hat-matmul passes against the
# band — cutting matmul FLOPs and hat-weight VPU work by H/band_h x W/band_w
# (6-7x each at DTU eval resolution) while keeping everything dense, static
# -shaped, and differentiable.
#
# Samples that fall inside the image but outside the band contribute zero
# (exactly like out-of-view samples). Bands are sized so this does not happen
# for MVS-plausible view pairs; tests/test_hat_warp.py measures agreement
# against the exact gather sampler on realistic geometry.
# ---------------------------------------------------------------------------


def _tile_minmax(vals, valid, lo_default):
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(valid, vals, big))
    hi = jnp.max(jnp.where(valid, vals, -big))
    ok = lo <= hi
    lo = jnp.where(ok, lo, lo_default)
    hi = jnp.where(ok, hi, lo_default)
    return lo, hi


def _band_start(lo, hi, band, limit):
    """Integer start of a `band`-wide window centred on [lo, hi], in [0, limit-band]."""
    centre = 0.5 * (lo + hi)
    start = jnp.round(centre - 0.5 * band)
    return jnp.clip(start, 0.0, float(limit - band)).astype(jnp.int32)


def _warp_tile_banded(src, xs, ys, valid, band_h, band_w, wdtype):
    """Banded two-pass hat warp of one output tile.

    src (H, W, C); xs/ys/valid (..., R, TW) sample coords (leading dims are
    plane-group etc., flattened into the matmul batch)
    -> ((..., R, TW, C), off_band_count).

    off_band_count counts samples that are valid (in-image) but land outside
    the (band_h, band_w) window and therefore contribute zero — the coverage
    contract violation that would otherwise silently corrupt the volume.
    """
    h, w, c = src.shape
    lead = xs.shape[:-1]  # (..., R)
    tw = xs.shape[-1]

    xs_f = xs.reshape(-1, tw)
    ys_f = ys.reshape(-1, tw)
    vf = valid.reshape(-1, tw).astype(jnp.float32)

    x_lo, x_hi = _tile_minmax(xs_f, vf > 0, jnp.float32(0.0))
    y_lo, y_hi = _tile_minmax(ys_f, vf > 0, jnp.float32(0.0))
    x0 = _band_start(x_lo, x_hi, band_w, w)
    y0 = _band_start(y_lo, y_hi, band_h, h)

    # Coverage-contract violations: hat support is (pos-1, pos+1), so a valid
    # sample contributes zero iff it sits at or beyond the band edge.
    x0f = x0.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)
    off = (vf > 0) & (
        (xs_f <= x0f - 1.0) | (xs_f >= x0f + band_w)
        | (ys_f <= y0f - 1.0) | (ys_f >= y0f + band_h)
    )
    off_count = jnp.sum(off.astype(jnp.int32))

    iota_bw = jnp.arange(band_w, dtype=jnp.float32)
    iota_bh = jnp.arange(band_h, dtype=jnp.float32)

    # Band-relative sample coordinates (small magnitudes keep every
    # downstream f32 product well-conditioned).
    xs_rel = xs_f - x0.astype(jnp.float32)
    ys_rel = ys_f - y0.astype(jnp.float32)

    # Horizontal hats vs the band columns, built once in the matmul dtype:
    # (Rf, TW, BW).
    hat_x = (_hat(xs_rel[..., None] - iota_bw) * vf[..., None]).astype(wdtype)

    # Row-curve height at the band's integer columns: per-row affine fit in
    # f32 carries the absolute coordinate (exact for shared-depth rows); the
    # hats transport only the few-pixel residual through one bf16 MXU matmul
    # — effectively exact (f32 accumulation; see _row_affine_fit) and ~15x
    # cheaper than the HIGHEST-precision f32 einsum it replaces, which was
    # the single largest device-time item of the whole cascade forward.
    a, cc = _row_affine_fit(xs_rel, ys_rel, vf)  # (Rf,), (Rf,)
    rho = (ys_rel - (a[:, None] * xs_rel + cc[:, None])) * vf  # (Rf, TW)
    rhs = jnp.stack([rho, vf], axis=-1).astype(wdtype)  # (Rf, TW, 2)
    nd = jnp.einsum("rob,rot->rbt", hat_x, rhs,
                    preferred_element_type=jnp.float32)  # (Rf, BW, 2)
    denom = nd[..., 1]
    corr = nd[..., 0] / jnp.maximum(denom, 1e-6)
    height = a[:, None] * iota_bw[None, :] + cc[:, None] + corr  # band-rel
    covered = (denom > 1e-3).astype(jnp.float32)

    # Vertical pass against the banded source window.
    src_band = jax.lax.dynamic_slice(src, (y0, x0, 0), (band_h, band_w, c))
    wv = (_hat(height[..., None] - iota_bh)
          * covered[..., None]).astype(wdtype)  # (Rf, BW, BH)
    tmp = jnp.einsum("rbv,vbc->rbc", wv, src_band.astype(wdtype),
                     preferred_element_type=jnp.float32)  # (Rf, BW, C)

    # Horizontal pass.
    out = jnp.einsum("rob,rbc->roc", hat_x, tmp.astype(wdtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(*lead, tw, c), off_count


def _pad_to(x, axis, multiple, mode="edge"):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, mode=mode)


def fused_variance_volume_banded(
    ref_feat: jnp.ndarray,  # (H, W, C)
    src_feats: jnp.ndarray,  # (V, H, W, C)
    rel_projs: jnp.ndarray,  # (V, 4, 4)
    depth_values: jnp.ndarray,  # (D,) or (D, H, W)
    tile_rows: int = 32,
    tile_cols: int = 128,
    band_h: int = 96,
    band_w: int = 192,
    depth_group: int | None = None,
    count_offband: bool = False,
    tiles_per_step: int = 1,
    mode: str = "variance",
    num_groups: int = 4,
) -> jnp.ndarray:
    """Banded tiled fused plane-sweep variance volume (D, H, W, C).

    With count_offband=True returns (volume, n) where n is the total number
    of valid-but-off-band samples (coverage-contract violations; see
    _warp_tile_banded) summed over views/tiles/planes — 0 when the band
    budget holds. Cheap enough to leave on in validation runs.

    Coverage contract: each band must cover its tile's source footprint —
    roughly the tile extent itself (near-unit epipolar scale in MVS pairs)
    plus the disparity spread of the depth_group planes sharing the window.
    Defaults (tile 32x128, band 96x192) leave a 64-px horizontal / 64-px
    vertical disparity budget; samples that land in-image but off-band
    contribute zero, exactly like out-of-view samples. Measured on TPU v5e
    at CasMVSNet stage-3 (864x1152, D=8, per-pixel hypotheses) this is
    ~7x faster than the dense two-pass with error identical to it
    (|banded - exact gather| mean 4.8e-5, q99 2.5e-4).

    depth_group planes share one source window per tile (narrow cascade/
    pyramid hypothesis windows make consecutive planes nearly coincident);
    a global sweep over the full depth range should use depth_group=1, but
    is usually better served by fused_variance_volume_hat (coarse stages
    are small enough that dense contraction wins — banding pays off at
    refine-stage resolutions).

    mode 'group_correlation' aggregates group-wise correlation against the
    reference features instead of variance (the AACVP cost,
    AACVP-MVSNet/models/AACVPMVSNet.py:108-136): output channels become
    num_groups, everything else — tiling, banding, coverage contract —
    is shared.

    Replaces reference MVSNet/models/mvsnet.py:156-170 + module.py:46-87.
    """
    h, w, c = ref_feat.shape
    nv = src_feats.shape[0]
    num_views = nv + 1
    d = depth_values.shape[0]
    wdtype = src_feats.dtype

    band_h = min(band_h, h)
    band_w = min(band_w, w)
    tile_rows = min(tile_rows, h)
    tile_cols = min(tile_cols, w)
    if band_h < tile_rows or band_w < tile_cols:
        raise ValueError(
            f"band ({band_h}x{band_w}) smaller than tile ({tile_rows}x"
            f"{tile_cols}): the source window cannot cover the tile's own "
            "footprint, silently zeroing most samples")
    if depth_group is None:
        depth_group = 1 if depth_values.ndim == 1 else min(16, d)
    while d % depth_group:
        depth_group -= 1
    g = depth_group

    # Per-pixel depth tiles (shared ladders broadcast lazily below).
    per_pixel = depth_values.ndim != 1

    nr = -(-h // tile_rows)
    nc = -(-w // tile_cols)
    hp, wp = nr * tile_rows, nc * tile_cols

    if per_pixel:
        dv = _pad_to(_pad_to(depth_values, 1, tile_rows), 2, tile_cols)
        dv = dv.reshape(d // g, g, nr, tile_rows, nc, tile_cols)
        dv = dv.transpose(0, 2, 4, 1, 3, 5)  # (D/g, nr, nc, g, R, TW)
        dv = dv.reshape(-1, g, tile_rows, tile_cols)
    else:
        dv = depth_values.reshape(d // g, g)[:, None, None]
        dv = jnp.broadcast_to(dv, (d // g, nr, nc, g))
        dv = dv.reshape(-1, g)[..., None, None]  # (N, g, 1, 1)

    n_tiles = (d // g) * nr * nc
    # Tile origin (y, x) per map step, aligned with dv's tile order.
    ri = (jnp.arange(n_tiles, dtype=jnp.int32) // nc) % nr
    ci = jnp.arange(n_tiles, dtype=jnp.int32) % nc
    origins = jnp.stack([ri * tile_rows, ci * tile_cols], axis=-1)  # (N, 2)

    row_iota = jnp.arange(tile_rows, dtype=jnp.float32)
    col_iota = jnp.arange(tile_cols, dtype=jnp.float32)

    rots = rel_projs[:, :3, :3]
    transes = rel_projs[:, :3, 3]

    ref_pad = _pad_to(_pad_to(ref_feat, 0, tile_rows), 1, tile_cols)
    # Hoisted per-view slices: indexing src_feats[v] inside tile_fn makes XLA
    # re-materialize every view's full feature map once per while iteration
    # (not hoisted out of the lax.map loop; ~54 ms/step at CasMVSNet stage 3).
    src_list = [src_feats[v] for v in range(nv)]

    corr_mode = mode == "group_correlation"
    if corr_mode:
        assert c % num_groups == 0, (c, num_groups)
        cg = c // num_groups

    def tile_fn(args):
        origin, depth_tile = args  # (2,), (g, R, TW) or (g, 1, 1)
        oy = origin[0].astype(jnp.float32)
        ox = origin[1].astype(jnp.float32)
        px = ox + col_iota[None, :]  # (1, TW)
        py = oy + row_iota[:, None]  # (R, 1)
        in_img = ((py < h) & (px < w))  # (R, TW) – padded rows/cols masked out

        ref_tile32 = jax.lax.dynamic_slice(
            ref_pad, (origin[0], origin[1], 0), (tile_rows, tile_cols, c)
        ).astype(jnp.float32)
        if corr_mode:
            ref_g = ref_tile32.reshape(tile_rows, tile_cols, num_groups, cg)
            acc = jnp.zeros((g, tile_rows, tile_cols, num_groups), jnp.float32)
        else:
            sum_f = jnp.zeros((g, tile_rows, tile_cols, c), jnp.float32)
            sum_sq = jnp.zeros_like(sum_f)
        off_total = jnp.int32(0)
        dep = jnp.broadcast_to(depth_tile, (g, tile_rows, tile_cols))
        # Tile pixel grid, arithmetic order identical to
        # geometry.homography.plane_sweep_coords (einsum then mul-add) so the
        # banded path bit-matches the dense/gather paths' f32 rounding.
        grid = jnp.stack([
            jnp.broadcast_to(px, (tile_rows, tile_cols)),
            jnp.broadcast_to(py, (tile_rows, tile_cols)),
            jnp.ones((tile_rows, tile_cols), jnp.float32),
        ])  # (3, R, TW)
        for v in range(nv):
            rot_xyz = jnp.einsum("ij,jhw->ihw", rots[v], grid)  # (3, R, TW)
            t = transes[v]
            q = rot_xyz[:, None] * dep[None] + t[:, None, None, None]
            qx, qy, qz = q[0], q[1], q[2]
            pos = qz > 1e-3
            safe_z = jnp.where(pos, qz, 1.0)
            xs = jnp.where(pos, qx / safe_z, -2.0 * w)
            ys = jnp.where(pos, qy / safe_z, -2.0 * h)
            valid = (pos & (xs > -1.0) & (xs < w) & (ys > -1.0) & (ys < h)
                     & in_img[None])
            warped, off = _warp_tile_banded(
                src_list[v], xs, ys, valid, band_h, band_w, wdtype
            )  # (g, R, TW, C)
            off_total = off_total + off
            warped = warped.astype(jnp.float32)
            if corr_mode:
                wg = warped.reshape(g, tile_rows, tile_cols, num_groups, cg)
                acc = acc + jnp.mean(wg * ref_g[None], axis=-1)
            else:
                sum_f = sum_f + warped
                sum_sq = sum_sq + warped * warped

        if corr_mode:
            return (acc / nv).astype(ref_feat.dtype), off_total
        sum_f = sum_f + ref_tile32[None]
        sum_sq = sum_sq + (ref_tile32 * ref_tile32)[None]
        mean = sum_f / num_views
        return (sum_sq / num_views - mean * mean).astype(ref_feat.dtype), off_total

    if tiles_per_step > 1:
        # Batch k tiles per while iteration: amortizes the loop's fixed
        # slicing/update overhead over k tiles (vmap keeps each tile's own
        # dynamic band window).
        k = tiles_per_step
        pad = (-n_tiles) % k
        if pad:
            origins = jnp.concatenate(
                [origins, jnp.repeat(origins[-1:], pad, 0)])
            dv = jnp.concatenate([dv, jnp.repeat(dv[-1:], pad, 0)])
        o2 = origins.reshape(-1, k, 2)
        d2 = dv.reshape(-1, k, *dv.shape[1:])
        tiles, off_counts = jax.lax.map(
            jax.checkpoint(jax.vmap(tile_fn)), (o2, d2))
        tiles = tiles.reshape(-1, *tiles.shape[2:])[:n_tiles]
    else:
        # Per-tile remat (see fused_variance_volume_hat): without it the
        # map's VJP materializes every tile's hat/warp residuals at once.
        tiles, off_counts = jax.lax.map(
            jax.checkpoint(tile_fn), (origins, dv))  # (N, g, R, TW, C)
    oc = num_groups if corr_mode else c
    vol = tiles.reshape(d // g, nr, nc, g, tile_rows, tile_cols, oc)
    vol = vol.transpose(0, 3, 1, 4, 2, 5, 6).reshape(d, hp, wp, oc)
    vol = vol[:, :h, :w]
    if count_offband:
        return vol, jnp.sum(off_counts)
    return vol
