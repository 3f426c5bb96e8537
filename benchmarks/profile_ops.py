"""Capture the bench-config CasMVSNet forward and print a per-op time table.

    python benchmarks/profile_ops.py [steps]

Uses mvs_tpu.utils.xplane (pure-python xplane.pb reader) so no TensorBoard/
XProf install is needed to see where device time goes.
"""
import os
import sys
import pathlib
import shutil
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/mvs_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mvs_tpu.cli.infer import make_apply_fn
from mvs_tpu.geometry import compose_projection, scale_intrinsics
from mvs_tpu.models.cas_mvsnet import CasMVSNet
from mvs_tpu.utils.synthetic import make_plane_scene
from mvs_tpu.utils.xplane import load_op_summary

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
height, width, num_views, batch = 864, 1152, 5, 6
dtype = jnp.bfloat16
sampler = os.environ.get("BENCH_SAMPLER", "hat")

scene = make_plane_scene(num_views=num_views, height=height, width=width, z0=10.0)
imgs = jnp.broadcast_to(jnp.asarray(scene.images)[None],
                        (batch, num_views, height, width, 3))
intr = jnp.broadcast_to(jnp.asarray(scene.intrinsics)[None],
                        (batch, num_views, 3, 3))
extr = jnp.broadcast_to(jnp.asarray(scene.extrinsics)[None],
                        (batch, num_views, 4, 4))
proj = {f"stage{i+1}": compose_projection(scale_intrinsics(intr, s), extr)
        for i, s in enumerate((0.25, 0.5, 1.0))}
depth_values = jnp.broadcast_to(jnp.linspace(8.0, 12.0, 192), (batch, 192))

model = CasMVSNet(ndepths=(48, 32, 8), compute_dtype=dtype, sampler=sampler)
small = make_plane_scene(num_views=num_views, height=64, width=64, z0=10.0)
s_intr = jnp.asarray(small.intrinsics)[None]
s_proj = {f"stage{i+1}": compose_projection(scale_intrinsics(s_intr, s),
                                            jnp.asarray(small.extrinsics)[None])
          for i, s in enumerate((0.25, 0.5, 1.0))}
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.key(0), jnp.asarray(small.images)[None], s_proj,
    depth_values[:1], train=False)

forward = make_apply_fn(model)
hlo_txt = forward.lower(variables, imgs, proj, depth_values).compile().as_text()
with open("/tmp/cas_fwd_hlo.txt", "w") as f:
    f.write(hlo_txt)
out = forward(variables, imgs, proj, depth_values)
jax.block_until_ready(out)

logdir = "/tmp/mvs_profile_ops"
shutil.rmtree(logdir, ignore_errors=True)
t0 = time.perf_counter()
with jax.profiler.trace(logdir):
    for _ in range(steps):
        out = forward(variables, imgs, proj, depth_values)
    jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / steps
print(f"{dt*1e3:.1f} ms/step ({batch/dt:.2f} maps/s)", flush=True)

ops = load_op_summary(logdir)
total = sum(r["time_ms"] for r in ops.values())
print(f"total device op time: {total:.1f} ms over {steps} steps "
      f"({total/steps:.1f} ms/step)")
print(f"{'ms/step':>9}  {'%':>5}  {'count':>6}  op")
for name, rec in sorted(ops.items(), key=lambda kv: -kv[1]["time_ms"])[:30]:
    ms = rec["time_ms"] / steps
    print(f"{ms:9.2f}  {100*rec['time_ms']/total:5.1f}  {rec['count']:6d}  {name[:110]}")

# ---- attribute to source lines via HLO metadata ----
import re
from collections import defaultdict

meta = {}
for m in re.finditer(r'%([\w.\-]+) = .*?metadata=\{([^}]*)\}', hlo_txt):
    name, md = m.group(1), m.group(2)
    src = re.search(r'source_file="([^"]+)"', md)
    line = re.search(r'source_line=(\d+)', md)
    key = (f"{src.group(1).split('/')[-1]}:{line.group(1)}" if src and line
           else "?")
    opn = re.search(r'op_name="([^"]+)"', md)
    meta[name] = (key, opn.group(1) if opn else "")

agg = defaultdict(lambda: [0.0, 0, set()])
for name, rec in ops.items():
    base = name.split(" ")[0].lstrip("%")
    key, opn = meta.get(base, ("<no-metadata(incl. while shells)>", ""))
    a = agg[key]
    a[0] += rec["time_ms"]
    a[1] += rec["count"]
    a[2].add(opn.split("/")[-1][:40])
print("\nby source line (while-loop shells double-count their bodies):")
for key, (t, cnt, opns) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
    print(f"{t/steps:8.2f} {100*t/total:5.1f}%  {key:28s} {sorted(opns)[:3]}")
