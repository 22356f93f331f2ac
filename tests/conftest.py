"""Test configuration: force the CPU backend with 8 virtual devices.

This is the analog of the reference's oversubscribed ``mpiexec -n {1,2,4}``
testing (``tests/CMakeLists.txt:53-91``): multi-device sharding is exercised
on host devices via ``--xla_force_host_platform_device_count``.  float64 is
enabled so numerical oracles can use tight tolerances (the TPU performance
path runs float32; correctness is validated here in f64).
"""

import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeated test runs skip recompiles (the
# distributed tests' shard_map compiles dominate suite wall-clock).
from l3ster_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
