"""Initial-state sampling: Halton sequences gated by collision checks.

Reference: guess_acados.py:79-109 — deterministic unscrambled Halton over
the joint range, zero velocities, reject configurations in collision.
Sampling is host-side; the collision gate is one batched jitted call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import qmc

from ..models.manipulator import ManipulatorModel


def sample_initial_states(model: ManipulatorModel, n: int,
                          seed_offset: int = 0,
                          margin: float = 0.0) -> jnp.ndarray:
    """(n, nx) collision-free states at rest, Halton-sampled like the
    reference (scramble=False, guess_acados.py:79)."""
    nq = model.nq
    sampler = qmc.Halton(d=nq, scramble=False)
    if seed_offset:
        sampler.fast_forward(seed_offset)
    lo = model.x_min[:nq] + margin
    hi = model.x_max[:nq] - margin
    out = []
    needed = n
    while needed > 0:
        draw = sampler.random(max(2 * needed, 64))
        q = lo + draw * (hi - lo)
        x = np.concatenate([q, np.zeros_like(q)], axis=1)
        ok = np.asarray(jax.jit(jax.vmap(model.check_collision))(jnp.asarray(x)))
        got = x[ok][:needed]
        out.append(got)
        needed -= got.shape[0]
    return jnp.asarray(np.concatenate(out, axis=0)[:n])
