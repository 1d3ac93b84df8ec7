"""Test configuration: CPU backend with a virtual 8-device mesh and f64.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``), mirroring how the driver
dry-runs the multi-chip path. Numerics tests run in float64 for tight
tolerances; the TPU bench path uses float32.
"""

import os

import pytest

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The hosting environment may pre-register an accelerator platform that
# overrides JAX_PLATFORMS; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: test-suite wall time is dominated by XLA
# compiles of the solver graphs; reruns become cache hits (the analogue of
# the reference's prebuilt generated/ C solvers).
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from safe_mpc_tpu.utils.cache import host_cache_dir as _hcd
# host-fingerprinted: a cache written on a different machine can SIGSEGV
# at load (safe_mpc_tpu/utils/cache.py)
_cache = _hcd(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "generated", "xla_cache_tests"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables at module boundaries. A cold-cache
    full-suite run accumulates ~150 live XLA CPU executables and the
    next backend_compile segfaults around the 120th compile (observed
    round 3, jax compiler.py:362); dropping them between files keeps
    the compiler arena bounded. The persistent disk cache makes the
    re-jits cheap."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
