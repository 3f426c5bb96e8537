"""Test harness config: force CPU with a virtual 8-device mesh.

Multi-chip sharding paths (mvs_tpu.parallel) are validated on a simulated
8-device CPU mesh, which the reference never had an analogue of (it exercised
multi-GPU only via live jobs — SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# A plugin may have imported jax before this conftest ran; the config route
# still works as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.device_count() == 8 and jax.devices()[0].platform == "cpu", jax.devices()
