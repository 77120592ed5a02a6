import os

# Run the test-suite on a simulated multi-device CPU mesh so sharding tests
# exercise real partitioning without TPU hardware (SURVEY §4).
#
# NOTE: the environment's sitecustomize imports jax and pins
# JAX_PLATFORMS=axon before user code runs, so the env var alone is not
# enough — jax.config.update after import is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
