"""Benchmark: CasMVSNet full-cascade depth-map inference throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
the extra keys carry the honesty data: "mfu" (measured-FLOPs/peak), "stages"
(per-stage ms breakdown at the exact cascade shapes), "device", and
"baseline_provenance".

Config matches the reference CasMVSNet eval setting (CasMVSNet/test.py:47-48,
test.sh): 1152x864 input, 5 views, ndepths 48/32/8, full-res depth output.

Baseline provenance: the reference repo publishes NO measured throughput of
its own (SURVEY.md §6 — no benchmarks/ dir, README has only star ratings).
BASELINE_DEPTH_MAPS_PER_SEC = 2.04 is 1/0.49 s — the per-view inference
runtime the CasMVSNet paper (arXiv 1912.06378, Tab. 5 "Cas-MVSNet", 1152x864
48/32/8) reports on its own GPU (16 GB V100-class). It is an EXTERNAL paper
number, not reproduced in-repo; vs_baseline is our chip vs their GPU at the
same algorithmic config. DTU quality is tracked separately via cli.evaluate.

The forward program measured here is mvs_tpu.cli.infer.make_apply_fn — the
SAME jitted program the batched inference CLI runs, so the benchmarked path
is the product path.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_DEPTH_MAPS_PER_SEC = 2.04  # see module docstring for provenance

# Peak bf16 FLOP/s per chip by device_kind substring (public TPU specs;
# conservative CPU fallback so MFU stays defined in CI).
_PEAK_FLOPS = (
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5", 197e12),   # v5e / "TPU v5 lite"
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def _peak_flops(device_kind: str) -> float | None:
    kind = device_kind.lower()
    if "tpu" not in kind and "axon" not in kind:
        return None
    for tag, peak in _PEAK_FLOPS:
        if tag in kind:
            return peak
    return None


def _timed(fn, args, sync, iters):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    # Persistent compilation cache: full-resolution cascade programs take
    # minutes to compile; cache them across bench invocations.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/mvs_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from mvs_tpu.cli.infer import make_apply_fn
    from mvs_tpu.geometry import compose_projection, scale_intrinsics
    from mvs_tpu.models.cas_mvsnet import CasMVSNet
    from mvs_tpu.utils.synthetic import make_plane_scene

    height = int(os.environ.get("BENCH_H", 864))
    width = int(os.environ.get("BENCH_W", 1152))
    num_views = int(os.environ.get("BENCH_VIEWS", 5))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    # Per-chip serving throughput: batch=6 reference views per step amortizes
    # the warp loops' fixed per-iteration cost (tile counts don't grow with
    # batch) — 5.79 vs 5.38 maps/s at batch=2 on v5e; batch=8 exceeds the
    # 16 GB HBM at these shapes. Latency-sensitive callers set BENCH_BATCH=1.
    batch = int(os.environ.get("BENCH_BATCH", 6))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" else jnp.float32
    sampler = os.environ.get("BENCH_SAMPLER", "hat")
    with_stages = os.environ.get("BENCH_STAGES", "1") == "1"
    ndepths = (48, 32, 8)

    scene = make_plane_scene(num_views=num_views, height=height, width=width,
                             z0=10.0)
    imgs = jnp.broadcast_to(jnp.asarray(scene.images)[None],
                            (batch, num_views, height, width, 3))
    intr = jnp.broadcast_to(jnp.asarray(scene.intrinsics)[None],
                            (batch, num_views, 3, 3))
    extr = jnp.broadcast_to(jnp.asarray(scene.extrinsics)[None],
                            (batch, num_views, 4, 4))
    proj = {
        f"stage{i + 1}": compose_projection(scale_intrinsics(intr, s), extr)
        for i, s in enumerate((0.25, 0.5, 1.0))
    }
    depth_values = jnp.broadcast_to(jnp.linspace(8.0, 12.0, 192), (batch, 192))

    model = CasMVSNet(ndepths=ndepths, compute_dtype=dtype, sampler=sampler)
    # Conv params are resolution-independent: initialize on a tiny dummy to
    # avoid compiling the full-resolution graph twice (init + forward).
    small = make_plane_scene(num_views=num_views, height=64, width=64, z0=10.0)
    s_imgs = jnp.asarray(small.images)[None]
    s_intr = jnp.asarray(small.intrinsics)[None]
    s_extr = jnp.asarray(small.extrinsics)[None]
    s_proj = {
        f"stage{i + 1}": compose_projection(scale_intrinsics(s_intr, s), s_extr)
        for i, s in enumerate((0.25, 0.5, 1.0))
    }
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), s_imgs, s_proj, depth_values[:1], train=False)

    # The product-path program (mvs_tpu.cli.infer): depth + confidence.
    forward = make_apply_fn(model)
    margs = (variables, imgs, proj, depth_values)

    # Synchronization is via host readback of real output bytes —
    # block_until_ready alone is not trusted on tunneled backends; the
    # device executes queued computations in order, so fetching the last
    # iteration's output bounds the whole loop.
    def sync(o):
        return np.asarray(o[0][:, :2, :2]).sum()

    # Measured-FLOPs for MFU: XLA's static cost analysis of this exact
    # program (counts what the compiled HLO executes, incl. the warps).
    flops = None
    try:
        cost = forward.lower(*margs).compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            f = float(c.get("flops", -1.0))
            flops = f if f > 0 else None
    except Exception:
        flops = None

    dt = _timed(forward, margs, sync, iters)
    value = batch / dt  # depth maps per second per chip

    # Accuracy cost of the fast sampler, carried WITH the perf number: depth
    # maps from the production sampler vs the exact gather sampler on the
    # same weights/batch, normalized by the stage-3 hypothesis interval
    # (the finest depth resolution the cascade reasons at). BENCH_DELTA=0
    # skips (saves one gather-sampler compile).
    depth_delta = None
    if os.environ.get("BENCH_DELTA", "1") == "1" and sampler != "gather":
        model_exact = CasMVSNet(ndepths=ndepths, compute_dtype=dtype,
                                sampler="gather")
        # Batch 1: the gather sampler materializes per-view warped volumes
        # and exceeds HBM at the serving batch; the delta is per-map anyway.
        proj1 = {k: v[:1] for k, v in proj.items()}
        d_fast = np.asarray(
            forward(variables, imgs[:1], proj1, depth_values[:1])[0],
            np.float32)
        d_exact = np.asarray(
            make_apply_fn(model_exact)(variables, imgs[:1], proj1,
                                       depth_values[:1])[0], np.float32)
        delta = np.abs(d_fast - d_exact)
        interval3 = float(depth_values[0, 1] - depth_values[0, 0])
        depth_delta = {
            "mean_over_interval": round(float(delta.mean()) / interval3, 4),
            "p99_over_interval": round(
                float(np.quantile(delta, 0.99)) / interval3, 4),
            "stage3_interval_units": round(interval3, 5),
            "exact_sampler": "gather",
        }

    dev = jax.devices()[0]
    device_kind = getattr(dev, "device_kind", str(dev))
    peak = _peak_flops(device_kind)
    mfu = round(flops / dt / peak, 4) if (flops and peak) else None

    result = {
        "metric": "casmvsnet_depth_maps_per_sec_per_chip_1152x864_48_32_8",
        "value": round(value, 4),
        "unit": "depth-maps/s",
        "vs_baseline": round(value / BASELINE_DEPTH_MAPS_PER_SEC, 4),
        "device": device_kind,
        "mfu": mfu,
        "model_tflops_per_map": round(flops / batch / 1e12, 3) if flops else None,
        "depth_delta": depth_delta,
        "baseline_provenance": "1/0.49s per view, CasMVSNet paper arXiv "
                               "1912.06378 Tab.5 (external, not measured "
                               "in-repo; see bench.py docstring)",
    }

    if with_stages:
        result["stages_ms"] = stage_breakdown(
            model, variables, imgs, proj, depth_values, dtype, sampler, sync,
            max(3, iters // 2))
        result["full_ms"] = round(dt * 1e3, 2)

    print(json.dumps(result))


def stage_breakdown(model, variables, imgs, proj, depth_values, dtype,
                    sampler, sync, iters):
    """Per-stage wall time at the exact cascade shapes.

    Times standalone jitted programs for each pipeline stage — feature
    extraction, per-stage warp+variance, per-stage cost regularization, and
    the softmax/regression/confidence epilogue — each at the shapes the full
    cascade runs them. Stage programs reuse the real params (sliced from the
    full model's variables by module name), so arithmetic and layouts match;
    the sum of stages approximates the fused full program from above (XLA
    may fuse across our cut points, so sum >= full is expected).
    """
    import jax
    import jax.numpy as jnp

    from mvs_tpu.geometry.depth import cascade_depth_samples
    from mvs_tpu.nn.cost_reg import UNetCostRegNet
    from mvs_tpu.nn.feature_nets import CascadeFeatureNet
    from mvs_tpu.ops.cost_volume import variance_cost_volume
    from mvs_tpu.ops.regression import regress_depth_and_confidence

    b, v, h, w, _ = imgs.shape
    ndepths = tuple(model.ndepths)
    ratios = tuple(model.depth_interval_ratios)
    out = {}

    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def subvars(name):
        sv = {"params": params[name]}
        if name in stats:
            sv["batch_stats"] = stats[name]
        return sv

    # ---- features ----
    fnet = CascadeFeatureNet(model.base_channels, len(ndepths),
                             model.arch_mode, model.normalization, None,
                             dtype=dtype)

    @jax.jit
    def run_feats(fv, x):
        return fnet.apply(fv, x, False)

    fvars = subvars(f"CascadeFeatureNet_0")
    flat = imgs.reshape(b * v, h, w, 3).astype(dtype)
    out["features"] = round(
        _timed(lambda fv, x: (run_feats(fv, x)["stage3"],), (fvars, flat),
               sync, iters) * 1e3, 2)
    feats = {k: f.reshape(b, v, *f.shape[1:])
             for k, f in jax.device_get(run_feats(fvars, flat)).items()}
    feats = {k: jnp.asarray(f) for k, f in feats.items()}

    # ---- per stage: warp+variance and cost-reg ----
    interval = (depth_values[:, -1] - depth_values[:, 0]) / depth_values.shape[1]
    depth = None
    for si in range(len(ndepths)):
        stage = f"stage{si + 1}"
        sf = feats[stage]
        sh, sw = sf.shape[2], sf.shape[3]
        p = proj[stage]
        rel = jnp.einsum("bvij,bjk->bvik", p[:, 1:], jnp.linalg.inv(p[:, 0]))
        cur = depth_values if depth is None else jax.image.resize(
            depth, (b, sh, sw), method="bilinear")
        hyp = jax.vmap(lambda cd, iv: cascade_depth_samples(
            cd, ndepths[si], iv * ratios[si], sh, sw))(cur, interval)
        st_sampler = sampler if (sampler != "hat" or si == 0) else "hat_banded"

        @jax.jit
        def run_warp(rf, sfeats, rp, hh):
            return jax.vmap(lambda a, bb, c, d: variance_cost_volume(
                a, bb, c, d, sampler=st_sampler, band_cfg=model.band_cfg)
            )(rf, sfeats, rp, hh)

        wargs = (sf[:, 0], sf[:, 1:], rel, hyp)
        out[f"warp_var_{stage}"] = round(
            _timed(lambda *a: (run_warp(*a),), wargs, sync, iters) * 1e3, 2)
        volume = run_warp(*wargs)

        reg = UNetCostRegNet(model.base_channels, model.normalization, None,
                             dtype=dtype, name=f"cost_reg_{stage}")

        @jax.jit
        def run_reg(rv, vol):
            return reg.apply(rv, vol, False)

        rvars = subvars(f"cost_reg_{stage}")
        out[f"cost_reg_{stage}"] = round(
            _timed(lambda rv, vol: (run_reg(rv, vol),), (rvars, volume),
                   sync, iters) * 1e3, 2)
        score = run_reg(rvars, volume)

        @jax.jit
        def run_epilogue(s, hh):
            d, c, _ = jax.vmap(regress_depth_and_confidence)(
                s.astype(jnp.float32), hh)
            return d, c

        out[f"epilogue_{stage}"] = round(
            _timed(lambda s, hh: run_epilogue(s, hh), (score, hyp),
                   sync, iters) * 1e3, 2)
        depth = run_epilogue(score, hyp)[0]

    out["sum"] = round(sum(t for t in out.values()), 2)
    return out


def train_main():
    """Training-envelope bench: one cascade TRAIN step at reference train
    shapes (DTU 640x512 crops, ndepths 48/32/8 — CasMVSNet/train.sh), with
    peak-HBM accounting. The reference envelope to compare: ~5 GB/GPU per
    batch-1 (CasMVSNet/code.md), max batch 3 on a 16 GB V100
    (MVSNet_pl/setup.md). Run: python bench.py --train [BENCH_TRAIN_BATCH=N]
    """
    import time

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/mvs_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from mvs_tpu.geometry import compose_projection, scale_intrinsics
    from mvs_tpu.models.cas_mvsnet import CasMVSNet
    from mvs_tpu.train import CascadeTask, TrainState, make_train_step
    from mvs_tpu.utils.synthetic import make_plane_scene

    height = int(os.environ.get("BENCH_TRAIN_H", 512))
    width = int(os.environ.get("BENCH_TRAIN_W", 640))
    batch = int(os.environ.get("BENCH_TRAIN_BATCH", 4))
    iters = int(os.environ.get("BENCH_ITERS", 8))
    num_views = 5
    sampler = os.environ.get("BENCH_SAMPLER", "hat")

    scene = make_plane_scene(num_views=num_views, height=height, width=width,
                             z0=10.0, tilt=(0.05, 0.03))
    imgs = jnp.broadcast_to(jnp.asarray(scene.images)[None],
                            (batch, num_views, height, width, 3))
    intr = jnp.broadcast_to(jnp.asarray(scene.intrinsics)[None],
                            (batch, num_views, 3, 3))
    extr = jnp.broadcast_to(jnp.asarray(scene.extrinsics)[None],
                            (batch, num_views, 4, 4))
    proj = {
        f"stage{i + 1}": compose_projection(scale_intrinsics(intr, s), extr)
        for i, s in enumerate((0.25, 0.5, 1.0))
    }
    depth_values = jnp.broadcast_to(jnp.linspace(8.0, 12.0, 192), (batch, 192))
    gt = {}
    masks = {}
    for i, s in enumerate((4, 2, 1)):
        g = jnp.broadcast_to(jnp.asarray(scene.depths[0][::s, ::s])[None],
                             (batch, height // s, width // s))
        gt[f"stage{i + 1}"] = g
        masks[f"stage{i + 1}"] = (g > 0).astype(jnp.float32)
    b = {"imgs": imgs, "proj_matrices": proj, "depth_values": depth_values,
         "depth_gt": gt, "mask": masks}

    model = CasMVSNet(ndepths=(48, 32, 8), compute_dtype=jnp.bfloat16,
                      sampler=sampler)
    task = CascadeTask(model)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), b["imgs"][:1], {k: v[:1] for k, v in proj.items()},
        depth_values[:1], train=True)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=optax.adam(1e-3),
    )
    step = make_train_step(task, donate=True)

    state, metrics = step(state, b)
    _ = float(metrics["loss"])  # forces execution
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, b)
    loss = float(metrics["loss"])  # readback bounds the loop
    dt = (time.perf_counter() - t0) / iters

    dev = jax.devices()[0]
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    peak = stats.get("peak_bytes_in_use")
    print(json.dumps({
        "metric": f"casmvsnet_train_steps_per_sec_{width}x{height}"
                  f"_48_32_8_b{batch}",
        "value": round(1.0 / dt, 4),
        "unit": "steps/s",
        "samples_per_sec": round(batch / dt, 3),
        "loss_finite": bool(np.isfinite(loss)),
        "peak_hbm_gb": round(peak / 2**30, 2) if peak else None,
        "device": getattr(dev, "device_kind", str(dev)),
        "reference_envelope": "~5 GB/GPU at batch 1 (CasMVSNet/code.md); "
                              "max batch 3 on 16 GB V100 (MVSNet_pl/setup.md)",
    }))


if __name__ == "__main__":
    import sys

    if "--train" in sys.argv:
        train_main()
    else:
        main()
