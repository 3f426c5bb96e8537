import os, sys, time
import jax, jax.numpy as jnp, numpy as np
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from mvs_tpu.nn.cost_reg import UNetCostRegNet

def sync(o): return np.asarray(o.ravel()[:4].astype(jnp.float32)).sum()

def bench(fn, *args, iters=10):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters

# CasMVSNet stages at 1152x864, B=2, bf16: (D,H,W,Cin) base_ch=8
stages = [
    ("stage1", (2, 48, 216, 288, 32)),
    ("stage2", (2, 32, 432, 576, 16)),
    ("stage3", (2, 8, 864, 1152, 8)),
]
for name, shp in stages:
    model = UNetCostRegNet(base_channels=8)
    mk = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), shp, jnp.bfloat16))
    x = mk(); sync(x)
    var = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 16, shp[-1]), jnp.bfloat16), train=False)
    fwd = jax.jit(lambda v, a: model.apply(v, a, train=False))
    t = bench(fwd, var, x)
    print(f"{name} {shp}: {t*1e3:8.2f}ms  (PALLAS={os.environ.get('MVS_TPU_PALLAS_CONV3D','1')})", flush=True)
