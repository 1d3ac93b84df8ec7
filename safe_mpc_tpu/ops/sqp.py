"""RTI and full-SQP drivers over the transcribed QP.

TPU-native equivalents of the reference's two solver modes
(parser.py:115-117,139):

* ``rti_step`` — SQP_RTI semantics: ONE linearization + ONE QP solve,
  FIXED_STEP (full step), LM regularization; status 0/4 like acados
  (controller.py:158-167). This is the per-tick hot path; vmap it over
  thousands of problems.
* ``sqp_solve`` — SQP semantics for initializer solves
  (MERIT_BACKTRACKING, nlp_max_iter budget; replaces both the acados
  full-SQP and the IPOPT paths, SURVEY.md §2.2). L1-merit backtracking
  line search; fixed iteration count with convergence masking so batches
  stay shape-uniform.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .qp import IPWarm, QPData, QPSolution, WARM_ITERS, WARM_MU0, solve_qp
from .transcribe import NodeSchedule, OcpSpec


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SolveResult:
    xs: jax.Array        # (N+1, nx) new iterate
    us: jax.Array        # (N, nu)
    status: jax.Array    # int32: 0 ok, 4 QP failure (acados convention)
    qp_viol: jax.Array   # max hard violation of the QP solution
    iters: jax.Array     # SQP iterations actually used (1 for RTI)


def rti_step(spec: OcpSpec, xg, ug, x0, schedule: NodeSchedule,
             qp_iters: int = 20) -> SolveResult:
    """One real-time iteration: linearize at the guess, solve one QP,
    take the full step (acados SQP_RTI + FIXED_STEP)."""
    data = spec.transcribe(xg, ug, x0, schedule)
    sol = solve_qp(data, iters=qp_iters)
    xs = xg + sol.dx
    us = ug + sol.du
    return SolveResult(xs=xs, us=us, status=sol.status,
                       qp_viol=sol.hard_violation,
                       iters=jnp.ones((), jnp.int32))


def rti_step_batched(spec: OcpSpec, xgs, ugs, x0s, schedule: NodeSchedule,
                     qp_iters: int = 20,
                     horizon_parallel: bool = False,
                     warm: IPWarm | None = None,
                     warm_iters: int = WARM_ITERS,
                     with_warm: bool = False,
                     kkt: str = "riccati"):
    """Whole-batch RTI step, fully batch-last: `transcribe_bl` linearizes
    all B*(N+1) nodes as one lane-packed program and `solve_qp_bl`
    consumes the QPDataBL with no layout changes — the TPU-throughput
    entry point. `schedule` may be shared (unbatched leaves, broadcast
    inside) or per-problem (leading B axis, e.g. vmapped
    ``controller.schedule``) — receding/parallel variants batch too.

    `warm` (the previous tick's warm state, shifted with
    ``ops.qp.shift_warm`` alongside the guess) switches the QP to the
    short warm schedule (`warm_iters` iterations from mu0=WARM_MU0) —
    the per-tick closed-loop configuration; HPIPM warm-starts the same
    way inside acados' RTI loop. With ``with_warm=True`` the return is
    ``(SolveResult, IPWarm)`` — the warm state is kept OUT of
    SolveResult because its leaves are batch-last (node-leading), which
    would corrupt the controllers' batch-leading tree reshapes."""
    from .qp_batched import solve_qp_bl

    datab = spec.transcribe_bl(xgs, ugs, x0s, schedule)
    if warm is None:
        sol = solve_qp_bl(datab, iters=qp_iters,
                          horizon_parallel=horizon_parallel, kkt=kkt)
    else:
        sol = solve_qp_bl(datab, iters=warm_iters, mu0=WARM_MU0,
                          horizon_parallel=horizon_parallel, warm=warm,
                          kkt=kkt)
    B = xgs.shape[0]
    res = SolveResult(xs=xgs + sol.dx, us=ugs + sol.du, status=sol.status,
                      qp_viol=sol.hard_violation,
                      iters=jnp.ones((B,), jnp.int32))
    if with_warm:
        return res, sol.warm
    return res


def sqp_solve_batched(spec: OcpSpec, xg, ug, x0, schedule: NodeSchedule,
                      max_iters: int = 50, qp_iters: int = 25,
                      tol: float = 1e-6, merit_rho: float = 1e4,
                      ls_steps: int = 8) -> SolveResult:
    """Whole-batch full SQP with per-problem L1-merit backtracking.

    Batched counterpart of :func:`sqp_solve` on the batch-last pipeline:
    each iteration transcribes + solves all problems in one lane-packed
    program, then evaluates ALL line-search candidates for ALL problems as
    one `merit_terms_bl` batch of size ls_steps*B. Per-problem convergence
    freezing, step acceptance and final feasibility verdicts match
    `sqp_solve` semantics (pinned by tests/test_sqp.py).
    """
    from .qp_batched import solve_qp_bl

    dtype = xg.dtype
    B = xg.shape[0]
    if dtype == jnp.float32:
        tol = max(tol, 1e-4)
    if schedule.safe_active.ndim == 1:
        schedule = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), schedule)

    def merit(xs, us, sched):
        cost, hard, soft_pen, dyn = spec.merit_terms_bl(xs, us, sched)
        return cost + soft_pen + merit_rho * (hard + dyn)

    alphas = 0.5 ** jnp.arange(ls_steps, dtype=dtype)
    sched_ls = jax.tree.map(
        lambda a: jnp.tile(a, (ls_steps,) + (1,) * (a.ndim - 1)), schedule)

    def iteration(carry, _):
        xs, us, done, n_used, last_status = carry
        datab = spec.transcribe_bl(xs, us, x0, schedule)
        sol = solve_qp_bl(datab, iters=qp_iters)

        m0 = merit(xs, us, schedule)                         # (B,)
        xs_c = (xs[None] + alphas[:, None, None, None] * sol.dx[None]) \
            .reshape((ls_steps * B,) + xs.shape[1:])
        us_c = (us[None] + alphas[:, None, None, None] * sol.du[None]) \
            .reshape((ls_steps * B,) + us.shape[1:])
        merits = merit(xs_c, us_c, sched_ls).reshape(ls_steps, B)
        best = jnp.argmin(merits, axis=0)                    # (B,)
        m_best = jnp.take_along_axis(merits, best[None], axis=0)[0]
        alpha = jnp.where(m_best < m0, alphas[best], alphas[-1])

        step_norm = jnp.maximum(jnp.max(jnp.abs(sol.dx), axis=(1, 2)),
                                jnp.max(jnp.abs(sol.du), axis=(1, 2)))
        converged = step_norm < tol

        take = (~done)[:, None, None]
        xs_new = jnp.where(take, xs + alpha[:, None, None] * sol.dx, xs)
        us_new = jnp.where(take, us + alpha[:, None, None] * sol.du, us)
        n_used = n_used + jnp.where(done, 0, 1).astype(jnp.int32)
        status_new = jnp.where(done, last_status, sol.status)
        done_new = jnp.logical_or(done, converged)
        return (xs_new, us_new, done_new, n_used, status_new), None

    init = (xg, ug, jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32))
    (xs, us, done, n_used, status), _ = jax.lax.scan(
        iteration, init, None, length=max_iters)

    # final feasibility verdict (same dtype-aware thresholds as sqp_solve);
    # the verdict is authoritative: a nonlinearly-feasible solution is
    # status 0 even if the last inner QP hit its iteration cap (its
    # internal hard_tol is stricter than these thresholds)
    _, hard, _, dyn = spec.merit_terms_bl(xs, us, schedule)
    n_dyn = xs.shape[-2] * xs.shape[-1]
    if dtype == jnp.float32:
        hard_thr, dyn_thr = 1e-3, 3e-5 * n_dyn
    else:
        hard_thr, dyn_thr = 1e-4, 1e-5
    bad = jnp.logical_or(hard > hard_thr, dyn > dyn_thr)
    status = jnp.where(bad, 4, 0).astype(jnp.int32)
    return SolveResult(xs=xs, us=us, status=status, qp_viol=hard,
                       iters=n_used)


def sqp_solve(spec: OcpSpec, xg, ug, x0, schedule: NodeSchedule,
              max_iters: int = 50, qp_iters: int = 25,
              tol: float = 1e-6, merit_rho: float = 1e4,
              ls_steps: int = 8) -> SolveResult:
    """Full SQP with L1-merit backtracking (globalization
    MERIT_BACKTRACKING, parser.py:139). Runs a fixed `max_iters` scan with
    converged problems frozen (batch-uniform compute under vmap)."""
    dtype = xg.dtype
    if dtype == jnp.float32:
        tol = max(tol, 1e-4)   # f32 step norms bottom out around 1e-5

    def merit(xs, us, data):
        cost = spec.total_cost(xs, us, schedule.p_ee)
        hard, soft_pen, dyn = spec.constraint_violation_l1(
            data, xs, us, schedule)
        return cost + soft_pen + merit_rho * (hard + dyn)

    def iteration(carry, _):
        xs, us, done, n_used, last_status = carry
        data = spec.transcribe(xs, us, x0, schedule)
        sol = solve_qp(data, iters=qp_iters)

        m0 = merit(xs, us, data)
        alphas = 0.5 ** jnp.arange(ls_steps, dtype=dtype)

        def try_alpha(a):
            return merit(xs + a * sol.dx, us + a * sol.du, data)

        merits = jax.vmap(try_alpha)(alphas)
        best = jnp.argmin(merits)
        alpha = jnp.where(merits[best] < m0, alphas[best], alphas[-1])

        step_norm = jnp.maximum(jnp.max(jnp.abs(sol.dx)),
                                jnp.max(jnp.abs(sol.du)))
        converged = step_norm < tol

        xs_new = jnp.where(done, xs, xs + alpha * sol.dx)
        us_new = jnp.where(done, us, us + alpha * sol.du)
        n_used = n_used + jnp.where(done, 0, 1).astype(jnp.int32)
        status_new = jnp.where(done, last_status, sol.status)
        done_new = jnp.logical_or(done, converged)
        return (xs_new, us_new, done_new, n_used, status_new), None

    init = (xg, ug, jnp.asarray(False), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32))
    (xs, us, done, n_used, status), _ = jax.lax.scan(
        iteration, init, None, length=max_iters)

    # final feasibility verdict at the solution (dtype-aware: the L1 sums
    # accumulate round-off over ~N*(nx+m) entries, so f32 needs wider
    # thresholds scaled per element)
    data = spec.transcribe(xs, us, x0, schedule)
    hard, _, dyn = spec.constraint_violation_l1(data, xs, us, schedule)
    n_dyn = xs.shape[-2] * xs.shape[-1]
    if dtype == jnp.float32:
        hard_thr, dyn_thr = 1e-3, 3e-5 * n_dyn
    else:
        hard_thr, dyn_thr = 1e-4, 1e-5
    bad = jnp.logical_or(hard > hard_thr, dyn > dyn_thr)
    # verdict is authoritative (see sqp_solve_batched)
    status = jnp.where(bad, 4, 0).astype(jnp.int32)
    return SolveResult(xs=xs, us=us, status=status, qp_viol=hard,
                       iters=n_used)
