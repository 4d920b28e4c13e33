"""Test configuration: run on a virtual 8-device CPU mesh in float64.

The multi-device tests follow SURVEY §4.5 ("distributed without a cluster"):
XLA_FLAGS=--xla_force_host_platform_device_count=8 on the CPU backend.
Float64 is enabled so the JAX path can be compared against the NumPy oracle
at reference (CPU double) precision.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
