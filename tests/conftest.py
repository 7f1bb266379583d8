"""Test configuration.

By default tests run on CPU with 8 virtual devices so multi-chip
sharding paths (jax.sharding.Mesh + shard_map) are exercised without
TPU hardware.  The environment pre-imports jax with JAX_PLATFORMS=axon
(the TPU tunnel) via sitecustomize, so the platform has to be switched
through jax.config, not env vars.

Set PPTPU_TEST_PLATFORM=axon to run the same suite on the real TPU
(slower compiles; used to validate bit-exactness on hardware).
"""

import os

_plat = os.environ.get("PPTPU_TEST_PLATFORM", "cpu")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if _plat:
    jax.config.update("jax_platforms", _plat)

# Persistent compile cache: the static-unrolled Pallas kernels cost
# ~50 s of Mosaic compile each; identical HLO (same structure/shape)
# hits this cache across tests and across runs, which keeps the
# PPTPU_TEST_PLATFORM=axon leg tractable.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass
