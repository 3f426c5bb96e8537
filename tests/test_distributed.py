"""Multi-process coordination smoke test.

Launches TWO real OS processes that rendezvous through
``maybe_initialize_distributed`` (MVS_TPU_COORDINATOR/NUM_PROCESSES/
PROCESS_ID — the analogue of the reference's MASTER_ADDR/WORLD_SIZE/RANK,
CasMVSNet/train.py:297-302) and run one cross-process collective sum.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_coordination_and_collective():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            MVS_TPU_COORDINATOR=f"127.0.0.1:{port}",
            MVS_TPU_NUM_PROCESSES="2",
            MVS_TPU_PROCESS_ID=str(rank),
        )
        # Workers pin jax to CPU themselves (config route); strip any forced
        # platform/device-count flags the pytest conftest set for THIS process.
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_dist_worker.py")],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} OK total=3.0 procs=2" in out, out
