import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
print("devices:", jax.devices(), flush=True)
import jax.numpy as jnp, numpy as np, optax
from mvs_tpu.models import MVSNet
from mvs_tpu.parallel import data_parallel_mesh, make_mesh, replicate, shard_batch
from mvs_tpu.train import MVSNetTask, TrainState, make_train_step
import sys; sys.path.insert(0, "tests")
from test_parallel import _mvsnet_batch

batch = _mvsnet_batch(8)
model = MVSNet()
variables = model.init(jax.random.key(0), batch["imgs"], batch["proj_matrices"], batch["depth_values"], train=True)
task = MVSNetTask(model)
def run(mesh):
    with jax.set_mesh(mesh):
        state = TrainState.create(apply_fn=model.apply,
            params=replicate(mesh, variables["params"]),
            batch_stats=replicate(mesh, variables["batch_stats"]),
            tx=optax.sgd(1e-2))
        sb = shard_batch(mesh, batch)
        step = make_train_step(task, donate=False)
        new_state, metrics = step(state, sb)
        return float(metrics["loss"]), jax.tree.map(lambda a, b: np.asarray(a - b), new_state.params, variables["params"])
l_dp, u_dp = run(data_parallel_mesh())
l_1, u_1 = run(make_mesh(data=1, devices=jax.devices()[:1]))
print(f"loss_dp={l_dp:.8f} loss_1={l_1:.8f}")
worst = []
for path, a in jax.tree_util.tree_flatten_with_path(u_dp)[0]:
    b = u_1
    for k in path: b = b[k.key]
    rel = np.linalg.norm(a-b)/max(np.linalg.norm(b), 1e-30)
    worst.append((rel, jax.tree_util.keystr(path), np.linalg.norm(b)))
worst.sort(reverse=True)
for r, p, n in worst[:10]:
    print(f"  {r:.2e}  ||upd||={n:.2e}  {p}")
