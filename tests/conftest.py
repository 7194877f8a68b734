import os

# Tests run on CPU with 8 virtual devices (multi-chip sharding is validated
# on a simulated mesh, per the reference's "small MPI runs on one node"
# strategy — SURVEY.md section 4) and float64 enabled (the reference is a
# double-precision solver).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough under the axon TPU plugin — set the config
# explicitly so tests always run on the simulated 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
