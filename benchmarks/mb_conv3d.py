import time, functools
import jax, jax.numpy as jnp, numpy as np
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from mvs_tpu.ops.conv3d_pallas import conv3d_folded, fold_factor

def sync(o): return np.asarray(o.ravel()[:4]).sum()

def bench(fn, x, *args, iters=10):
    out = fn(x, *args); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x, *args)
    sync(out)
    return (time.perf_counter() - t0) / iters

x = jnp.zeros((64, 1024, 1024), jnp.float32)
cp = jax.jit(lambda a: a + 1.0)
t = bench(cp, x)
print(f"calib: 256MB add: {t*1e3:.2f}ms -> {2*x.size*4/t/1e9:.0f} GB/s", flush=True)

def xla_conv(x, w, scale, shift):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC","DHWIO","NDHWC"))
    y = jax.lax.conv_general_dilated(x, w, (1,1,1), "SAME", dimension_numbers=dn)
    return jnp.maximum(y*scale+shift, 0.0)

shapes = [
    ("s1 conv0 32->8",  (2, 48, 216, 288, 32, 8)),
    ("s2 conv0 16->8",  (2, 32, 432, 576, 16, 8)),
    ("s2 conv2 16->16", (2, 16, 216, 288, 16, 16)),
    ("s3 conv0 8->8",   (2, 8, 864, 1152, 8, 8)),
]
xla_jit = jax.jit(xla_conv)
rng = np.random.default_rng(0)
for name, (b,d,h,w,ci,co) in shapes:
    mk = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (b,d,h,w,ci)))
    x = mk(); sync(x)
    k = jnp.asarray(rng.standard_normal((3,3,3,ci,co)).astype(np.float32))*0.1
    sc = jnp.ones((co,), jnp.float32); sh = jnp.zeros((co,), jnp.float32)
    f = fold_factor(ci, co)
    pf = jax.jit(functools.partial(conv3d_folded, relu=True, interpret=False))
    try:
        tp = bench(pf, x, k, sc, sh)
    except Exception as e:
        print(name, "pallas FAIL:", str(e).split('\n')[0][:140], flush=True); tp=float('nan')
    tx = bench(xla_jit, x, k, sc, sh)
    gb = b*d*h*w*ci*4/1e9
    print(f"{name}: f={f} pallas={tp*1e3:7.2f}ms ({gb/tp:5.0f}GB/s) xla={tx*1e3:7.2f}ms ({gb/tx:5.0f}GB/s) speedup={tx/tp:.2f}x", flush=True)
