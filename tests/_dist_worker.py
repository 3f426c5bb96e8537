"""Worker for the 2-process coordination smoke test (test_distributed.py).

Mirrors one rank of the reference's torch.distributed.launch workers
(CasMVSNet/train.py:297-302): initialize coordination from env, assert the
world size, run one cross-process collective, print a checkable line.
"""

import os
import sys


def main():
    import jax

    # The axon TPU plugin can register regardless of JAX_PLATFORMS (see
    # mvs_tpu.utils.platform); the config route wins pre-initialization.
    jax.config.update("jax_platforms", "cpu")

    from mvs_tpu.parallel.distributed import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "env did not request multi-process"
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rank = jax.process_index()
    devs = np.asarray(jax.devices())  # global: one CPU device per process
    assert devs.size == 2, devs
    mesh = Mesh(devs, ("data",))
    sharding = NamedSharding(mesh, P("data"))
    # Each process contributes its local shard; the jitted sum is a real
    # cross-process collective over the coordinator-established backend.
    x = jax.make_array_from_process_local_data(
        sharding, np.asarray([float(rank + 1)], np.float32)
    )
    total = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(x)
    print(f"RANK{rank} OK total={float(total):.1f} "
          f"procs={jax.process_count()}", flush=True)
    sys.exit(0)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
