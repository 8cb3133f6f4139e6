"""Test config: run on CPU with 8 simulated devices.

Multi-chip sharding paths are exercised the TPU-native way per SURVEY.md §4:
`--xla_force_host_platform_device_count=8` gives an 8-device CPU mesh so
collectives and NamedShardings compile and run without a pod. Must run
before the first `import jax` anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; force CPU at
# the config level, which wins as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # high-precision oracles in tests
# No persistent-cache AOT hits: a cached executable compiled with different
# machine features perturbs f64 results by ~1 ULP, breaking the bit-for-bit
# multi-process/single-process equivalence gates (test_multiprocess.py).
jax.config.update("jax_enable_compilation_cache", False)
