"""All-four-axes multichip parity: mesh (data=2, view=2, depth=2, space=2).

The driver's 8-device dryrun runs three model axes (data folds to 1); this
test is the missing configuration where data, view, depth, and space are
simultaneously >1 and ACTIVE — the stage-3 D=8 volume keeps the 'depth' mesh
axis busy via the fold-into-space guard (parallel/sharding.py), so no axis is
silently stripped. Runs in a subprocess because the session conftest pins an
8-device CPU topology.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_four_axis_mesh_parity():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "_mesh16_worker.py"), REPO],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "MESH16_OK" in proc.stdout, proc.stdout[-2000:]
