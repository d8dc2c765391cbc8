"""Test configuration: run everything on a virtual multi-device CPU mesh.

TPU-style multi-chip code paths are exercised without hardware by forcing the
CPU backend with 8 virtual devices (the TPU-world answer to testing
distributed code without a cluster).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("E3_COMPUTE_DTYPE", "float32")

import jax

# The axon TPU plugin forces jax_platforms at import; point the default at CPU
# so tiny unit-test shapes don't pay TPU compile latency.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_num_cpu_devices", 8)
