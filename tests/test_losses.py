"""Loss-function semantics, pinned against the reference's torch formulas.

OHEM parity target: reference MVSNet_pl/losses.py:12-19 — smooth-L1 over the
MASKED loss vector, then top-k with k = int(topk * n_valid) (the valid-pixel
count, NOT the total pixel count).
"""

import jax.numpy as jnp
import numpy as np

from mvs_tpu.train.losses import masked_smooth_l1, ohem_smooth_l1, smooth_l1


def _ohem_reference(est, gt, mask, topk=0.6):
    """Numpy transliteration of MVSNet_pl/losses.py:12-19 semantics."""
    err = np.abs(est - gt)
    loss = np.where(err < 1.0, 0.5 * err * err, err - 0.5)
    loss = loss[mask > 0.5]
    k = int(topk * loss.size)
    top = np.sort(loss.ravel())[::-1][:k]
    return float(np.mean(top))


def test_ohem_half_masked_matches_reference():
    rng = np.random.default_rng(0)
    est = rng.normal(500.0, 3.0, (2, 16, 24)).astype(np.float32)
    gt = rng.normal(500.0, 3.0, (2, 16, 24)).astype(np.float32)
    # Half-masked batch: k must follow the VALID count, not the total count.
    mask = np.zeros((2, 16, 24), np.float32)
    mask[:, :8] = 1.0
    ours = float(ohem_smooth_l1(jnp.array(est), jnp.array(gt), jnp.array(mask)))
    ref = _ohem_reference(est, gt, mask)
    assert abs(ours - ref) < 1e-5 * max(1.0, abs(ref)), (ours, ref)


def test_ohem_full_mask_matches_reference():
    rng = np.random.default_rng(1)
    est = rng.normal(0.0, 2.0, (1, 8, 8)).astype(np.float32)
    gt = rng.normal(0.0, 2.0, (1, 8, 8)).astype(np.float32)
    mask = np.ones_like(est)
    ours = float(ohem_smooth_l1(jnp.array(est), jnp.array(gt), jnp.array(mask)))
    ref = _ohem_reference(est, gt, mask)
    assert abs(ours - ref) < 1e-5 * max(1.0, abs(ref)), (ours, ref)


def test_ohem_all_masked_is_finite():
    z = jnp.zeros((1, 4, 4))
    out = float(ohem_smooth_l1(z + 3.0, z, z))
    assert np.isfinite(out)
    assert out == 0.0


def test_ohem_upper_bounds_masked_mean():
    # Hard-example mining mines the hardest pixels, so OHEM >= plain mean.
    rng = np.random.default_rng(2)
    est = jnp.array(rng.normal(0.0, 2.0, (2, 12, 12)).astype(np.float32))
    gt = jnp.array(rng.normal(0.0, 2.0, (2, 12, 12)).astype(np.float32))
    mask = jnp.array((rng.uniform(size=(2, 12, 12)) > 0.3).astype(np.float32))
    assert float(ohem_smooth_l1(est, gt, mask)) >= float(
        masked_smooth_l1(est, gt, mask)) - 1e-6


def test_smooth_l1_branches():
    e = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    out = np.asarray(smooth_l1(e))
    np.testing.assert_allclose(out, [1.5, 0.125, 0.0, 0.125, 1.5], atol=1e-6)
