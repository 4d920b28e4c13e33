"""Test configuration: run on a virtual 8-device CPU mesh in float64.

The multi-device tests follow SURVEY §4.5 ("distributed without a cluster"):
XLA_FLAGS=--xla_force_host_platform_device_count=8 on the CPU backend.
Float64 is enabled so the JAX path can be compared against the NumPy oracle
at reference (CPU double) precision.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment pins JAX_PLATFORMS to the TPU tunnel plugin; the config
# update (not the env var) reliably forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA CPU compiles are the dominant test cost
# in this environment; cache them across test processes.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
