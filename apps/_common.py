"""Shared runtime setup for the CLI apps: backend/dtype selection and the
persistent compilation cache (the analogue of the reference's
``generated/`` C-code cache, controller.py:243-248 — `build=False` reuse
becomes an XLA compilation-cache hit)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def setup_runtime(force_cpu: bool = False, cache_dir: str | None = None):
    """Configure backend + numerics. TPU runs f32 (no f64 linalg on TPU);
    CPU runs f64 for reference-grade numerics."""
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    from safe_mpc_tpu.utils.cache import host_cache_dir
    cache = cache_dir or host_cache_dir(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "generated", "xla_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # TPU matmuls default to bf16 multiplication — fatal for the IP/
    # Riccati numerics (1e4-scale penalties, 1e6 bound sentinels). Force
    # true f32 multiplication everywhere.
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    if backend == "cpu":
        jax.config.update("jax_enable_x64", True)
        dtype = "float64"
    else:
        dtype = "float32"
    return backend, dtype
