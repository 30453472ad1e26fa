"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Parity and sharding tests run on CPU so they are deterministic and do not need
TPU hardware; the driver separately compile-checks the TPU paths.
"""

import os
import sys

# The environment pins JAX_PLATFORMS=axon (TPU); tests force CPU for
# determinism and so the 8-device virtual mesh is available. Set
# GCFR_TEST_PLATFORM=axon to run the suite on the real chip instead.
os.environ["JAX_PLATFORMS"] = os.environ.get("GCFR_TEST_PLATFORM", "cpu")
if os.environ["JAX_PLATFORMS"] == "cpu":
    # The axon TPU plugin registers from sitecustomize before conftest runs,
    # gated on this variable; it must be cleared in subprocesses we spawn.
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This VM has a single CPU core; XLA compiles dominate test time. Persist
# compiled executables across pytest runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
