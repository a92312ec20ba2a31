"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
exercised on XLA's host platform with 8 virtual devices (the JAX-recommended
pattern for distributed testing), and float64 is enabled so numerics can be
validated against scipy/sklearn references.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and sets
# jax_platforms="axon,cpu" in every process, overriding JAX_PLATFORMS=cpu from
# the environment. Tests must run on the virtual CPU devices (float64 + 8-device
# mesh), so re-override here, after the sitecustomize has run.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# This box has a single CPU core; persist XLA compilations across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gpras")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
