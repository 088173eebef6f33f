"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (the reference's analog is
"run the same binary under mpirun", SURVEY.md §4).

Note: this environment's sitecustomize imports jax at interpreter boot, so
env vars alone are too late — jax.config.update selects the platform.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
