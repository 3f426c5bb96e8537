"""Benchmark: CasMVSNet full-cascade depth-map inference throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference CasMVSNet eval setting (CasMVSNet/test.py:47-48,
test.sh): 1152x864 input, 5 views, ndepths 48/32/8, full-res depth output.
vs_baseline compares against the reference pipeline's published inference rate
on its own GPU (~0.49 s/view => 2.04 depth-maps/s, CasMVSNet paper setup);
the DTU quality metric is tracked separately through cli.evaluate.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Reference GPU throughput for vs_baseline (depth-maps/s on the reference's
# own hardware at this config).
BASELINE_DEPTH_MAPS_PER_SEC = 2.04


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

    from mvs_tpu.geometry import compose_projection, scale_intrinsics
    from mvs_tpu.models.cas_mvsnet import CasMVSNet
    from mvs_tpu.utils.synthetic import make_plane_scene

    height = int(os.environ.get("BENCH_H", 864))
    width = int(os.environ.get("BENCH_W", 1152))
    num_views = int(os.environ.get("BENCH_VIEWS", 5))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    # Per-chip serving throughput: batch=2 reference views per step keeps the
    # MXU fed (46% over batch=1 on v5e); latency-sensitive callers can set
    # BENCH_BATCH=1.
    batch = int(os.environ.get("BENCH_BATCH", 2))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" else jnp.float32
    sampler = os.environ.get("BENCH_SAMPLER", "hat")

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

    model = CasMVSNet(ndepths=(48, 32, 8), compute_dtype=dtype, sampler=sampler)
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

    @jax.jit
    def forward(variables, imgs, proj, depth_values):
        out = model.apply(variables, imgs, proj, depth_values, train=False)
        return out["depth"], out["photometric_confidence"]

    # Warmup / compile. Synchronization is via host readback of real output
    # bytes — block_until_ready alone is not trusted on tunneled backends;
    # the device executes queued computations in order, so fetching the last
    # iteration's output bounds the whole loop.
    def sync(o):
        return np.asarray(o[0][:, :2, :2]).sum()

    out = forward(variables, imgs, proj, depth_values)
    sync(out)
    out = forward(variables, imgs, proj, depth_values)
    sync(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, imgs, proj, depth_values)
    sync(out)
    dt = (time.perf_counter() - t0) / iters

    value = batch / dt  # depth maps per second per chip
    print(json.dumps({
        "metric": "casmvsnet_depth_maps_per_sec_per_chip_1152x864_48_32_8",
        "value": round(value, 4),
        "unit": "depth-maps/s",
        "vs_baseline": round(value / BASELINE_DEPTH_MAPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
