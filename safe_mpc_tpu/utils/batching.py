"""Batch-execution helpers: chunked vmap to cap live HBM.

The fused RTI step holds ~10 MB of live intermediates per problem (nested
-AD linearization + IP scan state). One flat vmap over many thousands of
problems exceeds a single chip's HBM, so `chunked_vmap` runs the vmapped
function over fixed-size chunks under `lax.map` — live memory is one
chunk's, throughput stays on-device (no host round-trips), and the whole
thing remains one jittable program.
"""

from __future__ import annotations

import jax


def chunked_vmap(fn, chunk: int):
    """vmap(fn) evaluated chunk-by-chunk with lax.map.

    The leading axis of every input must be divisible by `chunk` (pad at
    the call site). Returns a function over the same batched signature.
    """
    vfn = jax.vmap(fn)

    def run(*args):
        def reshape(a):
            return a.reshape((-1, chunk) + a.shape[1:])
        parts = jax.tree.map(reshape, args)
        out = jax.lax.map(lambda xs: vfn(*xs), parts)
        return jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[2:]), out)

    return run
