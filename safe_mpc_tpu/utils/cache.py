"""Persistent-XLA-cache helpers.

jax's compilation cache stores CPU executables AOT-compiled for the
exact CPU-feature set of the writing host; loading them on a host with
different features can crash the process outright (cpu_aot_loader
feature-mismatch -> SIGSEGV during `get_executable_and_time`, observed
round 3 when a cache written on an AMX-capable builder was read on this
box). Keying the cache directory by a fingerprint of the host's CPU
flags makes stale cross-machine entries unreachable instead of fatal.
"""

from __future__ import annotations

import hashlib
import platform


def host_fingerprint() -> str:
    """Short stable hash of the host CPU's feature flags."""
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.strip()
                    break
    except OSError:
        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


def host_cache_dir(base: str) -> str:
    """`base` suffixed with the host fingerprint (see module docstring)."""
    return f"{base}_{host_fingerprint()}"
