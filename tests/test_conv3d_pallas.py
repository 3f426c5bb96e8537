"""Parity of the lane-folded Pallas 3x3x3 conv against lax.conv_general_dilated
(interpreter mode on CPU), mirroring the reference's CUDA-vs-torch kernel
equivalence style (PointMVSNet gather_knn.py:27-60)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_tpu.ops.conv3d_pallas import (
    conv3d_folded, fold_conv3d_weights, fold_factor,
)


def _ref_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(
        (1,) + x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "SAME", dimension_numbers=dn)[0]


@pytest.mark.parametrize("c_in,c_out,shape", [
    (16, 8, (4, 8, 16)),    # cascade stage-2 conv0 channel pattern
    (8, 8, (4, 8, 32)),     # stage-3 pattern (F=16)
    (32, 8, (4, 8, 8)),     # stage-1 conv0 (F=4)
    (16, 16, (3, 6, 16)),   # odd depth/height blocks
])
def test_folded_conv_matches_xla(c_in, c_out, shape):
    rng = np.random.default_rng(0)
    d, h, w = shape
    x = jnp.asarray(rng.standard_normal((d, h, w, c_in)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, c_in, c_out)).astype(np.float32)) * 0.1
    got = conv3d_folded(x, k, interpret=True)
    want = _ref_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_folded_conv_affine_relu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 8, 16, 16)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, 16, 16)).astype(np.float32)) * 0.1
    scale = jnp.asarray(rng.uniform(0.5, 2.0, 16).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    got = conv3d_folded(x, k, scale, shift, relu=True, interpret=True)
    want = jnp.maximum(_ref_conv(x, k) * scale + shift, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_folded_conv_batched():
    """batch>=2 rides the Pallas grid (regression: round-1 vmap-over-ANY
    BlockSpec crashed Mosaic lowering at the bench's batch=2)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 4, 8, 16, 16)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, 16, 8)).astype(np.float32)) * 0.1
    got = conv3d_folded(x, k, interpret=True)
    want = jnp.stack([_ref_conv(x[i], k) for i in range(x.shape[0])])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def _iter_pallas_eqns(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            yield eqn
        for v in eqn.params.values():
            for sub in (v if isinstance(v, (list, tuple)) else [v]):
                if hasattr(sub, "eqns"):
                    yield from _iter_pallas_eqns(sub)
                elif hasattr(sub, "jaxpr") and hasattr(sub.jaxpr, "eqns"):
                    yield from _iter_pallas_eqns(sub.jaxpr)


def test_folded_conv_batched_passes_mosaic_block_checks():
    """TPU-lowering smoke without TPU hardware: run Mosaic's static
    BlockSpec/index-map validation on the traced batched pallas_call. This is
    exactly the check that rejected the round-1 vmap-over-ANY formulation."""
    try:
        from jax._src.pallas.mosaic.lowering import _check_block_mappings
    except ImportError:
        pytest.skip("jax internals moved; Mosaic check unavailable")
    from mvs_tpu.ops.conv3d_pallas import (
        conv3d_lane_folded, fold_conv3d_weights, fold_volume)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 16)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, 16, 8)).astype(np.float32)) * 0.1
    f = fold_factor(16, 8)
    xf = fold_volume(x, f)
    taps = fold_conv3d_weights(k, f)
    scale = jnp.ones((taps.shape[-1],), jnp.float32)
    shift = jnp.zeros((taps.shape[-1],), jnp.float32)
    fn = lambda a: conv3d_lane_folded(a, taps, scale, shift, relu=True,
                                      interpret=False)
    closed = jax.make_jaxpr(fn)(xf)
    eqns = list(_iter_pallas_eqns(closed.jaxpr))
    assert eqns, "no pallas_call traced"
    for eqn in eqns:
        gm = eqn.params["grid_mapping"]
        # lowering_context is unused by the check (del'd in its first line).
        _check_block_mappings(gm.block_mappings, None, closed.jaxpr.debug_info)


def test_fallback_when_unfoldable():
    rng = np.random.default_rng(2)
    # W=10 not divisible by F=8 -> XLA fallback, still correct.
    x = jnp.asarray(rng.standard_normal((2, 4, 10, 16)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, 16, 16)).astype(np.float32)) * 0.1
    got = conv3d_folded(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref_conv(x, k)),
                               rtol=2e-4, atol=2e-4)


def test_fold_weights_structure():
    """A tap matrix's block (j, i) must equal w[dz,dy,dx] where dx maps
    (i, dwf) -> j; absent links are zero."""
    rng = np.random.default_rng(3)
    c = 4
    f = fold_factor(c, c)  # 32
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)).astype(np.float32))
    taps = np.asarray(fold_conv3d_weights(w, f))
    # centre tap (dz=1, dy=1, dwf=1): diagonal blocks = w[1,1,1],
    # super/sub-diagonal = w[1,1,2] / w[1,1,0].
    t = taps[1 * 9 + 1 * 3 + 1]
    for i in range(f):
        np.testing.assert_allclose(
            t[i * c:(i + 1) * c, i * c:(i + 1) * c], w[1, 1, 1])
    for i in range(f - 1):
        # input j = i+1 feeds output i via dx=+1; j = i feeds output i+1 via dx=-1
        np.testing.assert_allclose(
            t[(i + 1) * c:(i + 2) * c, i * c:(i + 1) * c], w[1, 1, 2])
        np.testing.assert_allclose(
            t[i * c:(i + 1) * c, (i + 1) * c:(i + 2) * c], w[1, 1, 0])
    # cross-cell tap (dwf=2) carries only the (j=0, i=f-1) corner block.
    t = taps[1 * 9 + 1 * 3 + 2]
    np.testing.assert_allclose(t[0:c, (f - 1) * c:f * c], w[1, 1, 2])
    assert np.abs(t).sum() == pytest.approx(np.abs(w[1, 1, 2]).sum(), rel=1e-5)
