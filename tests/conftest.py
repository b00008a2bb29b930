"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here the way the reference validates
multi-rank MPI with local ``mpiexec -n N`` (lib/petiga/conf/test): JAX's
host-platform device-count override gives us 8 virtual devices, and
float64 is enabled so convergence-rate oracles are sharp.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize may have force-registered a remote TPU
# backend and overridden jax_platforms; tests must run on the local CPU
# mesh, so set it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
