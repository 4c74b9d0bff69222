"""Test configuration: CPU backend with 8 virtual devices (the multi-chip
sharding testbed, mirroring SURVEY.md section 4's porting note) and 64-bit
mode so the reference's float64 tolerances are testable."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env may point at a TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The outer environment may have imported jax already (sitecustomize) with the
# TPU platform baked in; override through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
