"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Parity and sharding tests run on CPU so they are deterministic and do not need
TPU hardware; the driver separately compile-checks the TPU paths. Set
GCFR_TEST_PLATFORM=axon to run the suite on the real chip instead.
"""

import os
import sys

# The environment pins JAX_PLATFORMS=axon (TPU) and registers the axon PJRT
# plugin from sitecustomize — *before* conftest runs — so the env var is too
# late. jax.config (below) still wins as long as no backend has resolved.
_desired = os.environ.get("GCFR_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _desired)

# This VM has a single CPU core; XLA compiles dominate test time. Persist
# compiled executables across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
