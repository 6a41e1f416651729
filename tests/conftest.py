"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere (pytest imports conftest first).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: the JAX_PLATFORMS env var is not honored in this environment (a TPU
# plugin overrides it); the jax.config update is.
import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache for the suite: repeat runs skip recompiles
# (the full suite spends most of its ~25 min compiling).  A dedicated
# dir, NOT the shared TPU/bench cache: entries there include CPU AOT
# results from other machine types, which XLA:CPU loads with
# machine-feature-mismatch warnings.
jax.config.update(
    "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache_tests"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
