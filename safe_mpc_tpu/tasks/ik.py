"""Inverse kinematics initializer: find a collision-free rest state whose
EE hits a target (reference InverseKinematicsOCP, ocp.py:305-349 — an
IPOPT feasibility problem; here a damped Gauss-Newton with bound clipping
and penalty terms for collision clearance, batched over seeds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.manipulator import ManipulatorModel


def solve_ik(model: ManipulatorModel, target, q_init=None, iters: int = 80,
             damping: float = 1e-3, collision_weight: float = 10.0):
    """Solve ee(q) = target with q within bounds and collision clearance.

    Returns (x (nx,), converged bool). Penalized damped GN, jit-safe.
    """
    nq = model.nq
    target = jnp.asarray(target)
    if q_init is None:
        q_init = jnp.asarray((model.x_min[:nq] + model.x_max[:nq]) / 2)
    lo = jnp.asarray(model.x_min[:nq])
    hi = jnp.asarray(model.x_max[:nq])
    col_lo, col_hi = model.collision_bounds if model.n_collision else (None, None)

    def residuals(q):
        x = jnp.concatenate([q, jnp.zeros(nq, q.dtype)])
        r = model.ee_pos(x) - target
        if model.n_collision:
            vals = model.collision_values(x)
            viol = jnp.maximum(jnp.asarray(col_lo, q.dtype) - vals, 0.0) \
                + jnp.maximum(vals - jnp.asarray(col_hi, q.dtype), 0.0)
            r = jnp.concatenate([r, collision_weight * viol])
        return r

    def body(q, _):
        r = residuals(q)
        J = jax.jacfwd(residuals)(q)
        H = J.T @ J + damping * jnp.eye(nq, dtype=q.dtype)
        dq = -jnp.linalg.solve(H, J.T @ r)
        q = jnp.clip(q + dq, lo, hi)
        return q, None

    q, _ = jax.lax.scan(body, q_init, None, length=iters)
    x = jnp.concatenate([q, jnp.zeros(nq, q.dtype)])
    err = jnp.linalg.norm(model.ee_pos(x) - target)
    ok = jnp.logical_and(err < 1e-4, model.check_collision(x))
    return x, ok


def solve_ik_multistart(model: ManipulatorModel, target, n_starts: int = 16,
                        key=None):
    """Batched multi-start IK; returns the best collision-free solution."""
    nq = model.nq
    if key is None:
        key = jax.random.PRNGKey(0)
    lo = jnp.asarray(model.x_min[:nq])
    hi = jnp.asarray(model.x_max[:nq])
    qs = jax.random.uniform(key, (n_starts, nq), minval=lo, maxval=hi,
                            dtype=lo.dtype)
    xs, oks = jax.vmap(lambda q: solve_ik(model, target, q))(qs)
    errs = jax.vmap(lambda x: jnp.linalg.norm(model.ee_pos(x)
                                              - jnp.asarray(target)))(xs)
    errs = jnp.where(oks, errs, jnp.inf)
    best = jnp.argmin(errs)
    return xs[best], oks[best]


def solve_ik_diverse(model: ManipulatorModel, target, n_anchors: int = 6,
                     n_starts: int = 64, min_sep: float = 0.5, key=None):
    """Up to `n_anchors` PAIRWISE-DISTINCT collision-free IK solutions
    (greedy farthest-point selection over converged multistarts, q-space
    separation >= min_sep rad). Deep OCP wedges are arm-CONFIGURATION
    traps — escaping needs a different arm branch, so replanning
    (sim/replan.py) seeds one guess per distinct branch."""
    import numpy as np

    nq = model.nq
    if key is None:
        key = jax.random.PRNGKey(0)
    lo = jnp.asarray(model.x_min[:nq])
    hi = jnp.asarray(model.x_max[:nq])
    qs = jax.random.uniform(key, (n_starts, nq), minval=lo, maxval=hi,
                            dtype=lo.dtype)
    xs, oks = jax.vmap(lambda q: solve_ik(model, target, q))(qs)
    xs = np.asarray(xs)[np.asarray(oks)]
    if xs.shape[0] == 0:
        return np.zeros((0, model.nx))
    picked = [xs[0]]
    for x in xs[1:]:
        d = min(np.linalg.norm(x[:nq] - p[:nq]) for p in picked)
        if d >= min_sep:
            picked.append(x)
        if len(picked) >= n_anchors:
            break
    return np.stack(picked)
