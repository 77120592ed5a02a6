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
# persistent compile cache: the suite's wall-clock is dominated by XLA
# CPU compiles of full hydro steps (minutes each); re-runs on the same
# machine start from the cache in seconds
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
