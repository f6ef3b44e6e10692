"""Test configuration: force an 8-device CPU mesh so multi-chip sharding tests
run anywhere (SURVEY.md §4: the JAX-native way to fake an 8-chip mesh).

Must run before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: XLA CPU compiles dominate test wall-clock on
# this box; cache them across pytest invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The environment pre-sets JAX_PLATFORMS=axon (real-TPU tunnel) which can win
# over the env var above; force the config flag too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
