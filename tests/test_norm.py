"""Debiased-BatchNorm regression tests.

The running statistics are zero-initialized EMAs divided by 1 - m^count at
read time (Adam-style bias correction), so eval-mode normalization matches
train-mode statistics after a handful of updates instead of lagging toward
the zero/unit init for ~1/(1-m) steps. This is what lets the short e2e
training fixture produce eval-mode depth maps that reflect what was learned
(the reference relies on epochs-long training for its torch BN running stats
to converge, e.g. MVSNet/train.py:123-186).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvs_tpu.nn.blocks import ConvBlock, FusedConvBlock3D


class _M2(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return ConvBlock(8)(x, train)


class _M3(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return FusedConvBlock3D(16)(x, train)


def _fit_stats(model, x, steps):
    v = model.init(jax.random.key(0), x, train=True)
    for _ in range(steps):
        _, upd = model.apply(v, x, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    return v


def test_convblock_eval_matches_train_after_few_steps():
    # Large mean / modest variance: the regime where a biased EMA from a
    # zero init visibly corrupts eval-mode normalization.
    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 3)) * 3.0 + 5.0
    m = _M2()
    v = _fit_stats(m, x, steps=8)
    y_train, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    y_eval = m.apply(v, x, train=False)
    assert float(jnp.abs(y_train - y_eval).max()) < 1e-4


def test_fused_block_eval_matches_train_after_few_steps():
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 8, 16)) * 2.0 + 1.0
    m = _M3()
    v = _fit_stats(m, x, steps=8)
    y_train, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    y_eval = m.apply(v, x, train=False)
    assert float(jnp.abs(y_train - y_eval).max()) < 1e-4


def test_bn_recal_equal_weight_mean():
    """The cli.train BN recalibration scheme: each batch's moments read from
    a FRESH zero tree after one EMA step (debias denom 1-m cancels exactly),
    then tree-averaged — this must equal the plain equal-weight mean of the
    per-batch moments, with no geometric weighting."""
    import numpy as np

    m = _M2()
    x0 = jax.random.normal(jax.random.key(3), (4, 8, 8, 3))
    v = m.init(jax.random.key(0), x0, train=True)
    batches = [
        jax.random.normal(jax.random.key(10 + i), (4, 8, 8, 3)) * (1 + i)
        for i in range(4)
    ]
    zero = jax.tree.map(jnp.zeros_like, v["batch_stats"])
    acc = None
    for xb in batches:
        _, upd = m.apply({"params": v["params"], "batch_stats": zero}, xb,
                         train=True, mutable=["batch_stats"])
        s = upd["batch_stats"]
        acc = s if acc is None else jax.tree.map(jnp.add, acc, s)
    stats = jax.tree.map(lambda a: a / len(batches), acc)

    # Debiased read of the recal tree == equal-weight mean of batch moments.
    bn = stats["ConvBlock_0"]["Norm_0"]
    count = float(bn["count"])
    denom = 1.0 - 0.9 ** count
    got_mean = np.asarray(bn["mean"]) / denom
    conv = {"params": v["params"]["ConvBlock_0"]["Conv_0"]}

    def conv_out(xb):
        from mvs_tpu.nn.blocks import FoldedConv

        return FoldedConv(8, (3, 3), use_bias=False).apply(conv, xb)

    want_mean = np.mean(
        [np.asarray(jnp.mean(conv_out(xb), axis=(0, 1, 2))) for xb in batches],
        axis=0)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-5, atol=1e-5)


def test_eval_before_any_update_is_identity_stats():
    """count == 0 must fall back to (mean 0, var 1), not divide by ~0."""
    x = jnp.ones((2, 4, 4, 3))
    m = _M2()
    v = m.init(jax.random.key(0), x, train=True)
    y = m.apply(v, x, train=False)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_convblock_eval_bn_fusion_matches_unfused():
    """Eval-mode ConvBlock folds the BN affine (+ReLU) into the conv
    epilogue; output must match the explicit conv -> Norm -> relu chain."""
    from mvs_tpu.nn.blocks import ConvBlock, ConvTransposeBlock, Norm

    for Block, c_in in ((ConvBlock, 3), (ConvTransposeBlock, 8)):
        m = Block(8, (3, 3))
        x0 = jax.random.normal(jax.random.key(0), (2, 16, 16, c_in))
        v = m.init(jax.random.key(1), x0, train=True)
        # a few BN updates so the stats are non-trivial
        stats = v["batch_stats"]
        for i in range(3):
            xi = jax.random.normal(jax.random.key(10 + i), (2, 16, 16, c_in))
            _, upd = m.apply({"params": v["params"], "batch_stats": stats},
                             xi, train=True, mutable=["batch_stats"])
            stats = upd["batch_stats"]
        var = {"params": v["params"], "batch_stats": stats}
        fused = m.apply(var, x0, train=False)

        # Explicit reference composition: conv (no affine) then Norm + relu.
        import numpy as np

        inner = "Conv_0" if Block is ConvBlock else "ConvTranspose_0"
        from mvs_tpu.nn.blocks import FoldedConv, FoldedConvTranspose

        Folded = FoldedConv if Block is ConvBlock else FoldedConvTranspose
        kwargs = {"use_bias": False} if Block is ConvBlock else {}
        y = Folded(8, (3, 3), **kwargs).apply(
            {"params": var["params"][inner]}, x0)
        y = Norm("batch").apply(
            {"params": var["params"]["Norm_0"],
             "batch_stats": var["batch_stats"]["Norm_0"]}, y, False)
        want = jax.nn.relu(y)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
