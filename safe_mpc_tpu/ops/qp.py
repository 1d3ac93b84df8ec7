"""Batched stage-structured QP solver: primal-dual interior point + Riccati.

TPU-native replacement for HPIPM (the reference's QP engine inside acados,
controller.py:100-103, config.yaml:15-18). Same problem class:

  min  sum_k 1/2 dx_k' Q_k dx_k + q_k' dx_k + 1/2 du_k' R_k du_k + r_k' du_k
       + sum soft rows: zl*sl + 1/2 Zl sl^2 + zu*su + 1/2 Zu su^2
  s.t. dx_{k+1} = A dx_k + B du_k + c_k,      dx_0 = dx0   (pinned x0)
       lo <= h_k + Cx_k dx_k + Cu_k du_k (+ sl - su if soft) <= up
       sl, su >= 0

Soft constraints follow HPIPM's slack model exactly (idxsh/zl/zu/Zl/Zu,
reference controller.py:60-94): lower slack relaxes the lower bound, upper
slack the upper bound, with linear+quadratic penalties.

Algorithm: log-barrier primal-dual IP with a fixed iteration count
(batch-uniform compute). Each Newton step eliminates the per-row barrier
pairs and the per-row soft slacks *analytically* (scalar Schur
complements), producing a stage-wise LQR solved by one Riccati backward
`lax.scan` + forward rollout. Everything vmaps over problems — thousands
of independent OCPs solve as one batched program.

Notation per inequality row (value r(w) = h + g'w):
  lower:  c1 = r - lo + sl >= 0,  c2 = sl >= 0
  upper:  c3 = up - r + su >= 0,  c4 = su >= 0
Each one-sided constraint i carries an IP pair (t_i > 0, lam_i > 0) with
c_i = t_i, t_i*lam_i = mu at the central path. The Newton elimination gives
per-row effective weights d~ and gradients gamma~ (derivation in comments
at `_row_weights`); inactive rows are masked to zero contribution — the
branchless analogue of the reference's `casadi_if_else` constraint gating
(utils.py:207-210).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class QPData:
    """One OCP-QP instance (leading batch axes allowed on every field).

    Shapes for horizon N, state nx, control nu, m rows per node:
      A (nx,nx), B (nx,nu), c (N,nx), dx0 (nx,)
      Q (N+1,nx,nx), q (N+1,nx), R (N,nu,nu), r (N,nu)
      Cx (N+1,m,nx), Cu (N+1,m,nu), h (N+1,m), lo/up (N+1,m)
      active/soft (N+1,m) in {0,1};  zl/zu/Zl/Zu (N+1,m)
    Terminal-node control blocks (R[N], Cu[N]) do not exist; callers pass
    (N, ...) control arrays. Inactive rows are ignored entirely.
    """

    A: jax.Array
    B: jax.Array
    c: jax.Array
    dx0: jax.Array
    Q: jax.Array
    q: jax.Array
    R: jax.Array
    r: jax.Array
    Cx: jax.Array
    Cu: jax.Array
    h: jax.Array
    lo: jax.Array
    up: jax.Array
    active: jax.Array
    soft: jax.Array
    zl: jax.Array
    zu: jax.Array
    Zl: jax.Array
    Zu: jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class IPWarm:
    """Interior-point slack/dual state carried across RTI ticks, in
    UNSCALED row units (the per-row normalization changes between
    linearizations, so the solver rescales on entry/exit). Leaves are
    (N+1, m, B) in the batch-last pipeline. This is the TPU analogue of
    HPIPM's dual warm start inside acados' RTI loop: consecutive 5 ms
    ticks solve near-identical QPs, so re-entering at the previous
    central-path point lets a short barrier schedule (mu0 ~ 0.4, ~8
    iterations) reach the same final mu as the cold 15-iteration schedule
    from mu0 = 1e2."""

    sl: jax.Array
    su: jax.Array
    t1: jax.Array
    l1: jax.Array
    t2: jax.Array
    l2: jax.Array
    t3: jax.Array
    l3: jax.Array
    t4: jax.Array
    l4: jax.Array


# warm-schedule defaults. WARM_MU0 caps the adaptive (complementarity
# -seeded) entering barrier; WARM_ITERS=4 is the measured knee
# (round 5): the Z1 closed-loop chain matches the cold 15-iteration
# schedule with zero status failures and final EE errors within ~5e-3
# at WI∈{4,5,6} (scripts_dev/diag_warmstart.py), while WI=3 shows the
# first warm status failure (1/480) — so 4 keeps one iteration of
# margin above the cliff. TPU headline at WI=4: 9.8k solves/s at
# B=512, 10.2k at B=640, ok_fraction 1.0 (was 8.5k at the old WI=6).
WARM_MU0 = 0.4
WARM_ITERS = 4


def shift_warm(warm: IPWarm, axis: int = 0) -> IPWarm:
    """Shift the warm state one node forward (roll -1, duplicate last) to
    track the RTI guess shift (provideControl, controller.py:169-184):
    after the shift, new node k's constraints sit where old node k+1's
    were. `axis` is the node axis (0 for the batch-last pipeline)."""
    def sh(a):
        rolled = jnp.roll(a, -1, axis=axis)
        last = jax.lax.index_in_dim(a, a.shape[axis] - 1, axis=axis,
                                    keepdims=True)
        return jax.lax.dynamic_update_index_in_dim(
            rolled, jnp.squeeze(last, axis=axis), a.shape[axis] - 1, axis)
    return jax.tree.map(sh, warm)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class QPSolution:
    dx: jax.Array        # (N+1, nx)
    du: jax.Array        # (N, nu)
    sl: jax.Array        # (N+1, m) lower soft slacks
    su: jax.Array        # (N+1, m)
    hard_violation: jax.Array   # scalar: max hard-row violation at solution
    eq_residual: jax.Array      # scalar: max dynamics residual (==0 by constr.)
    stat_residual: jax.Array    # scalar: complementarity at last iterate
    status: jax.Array           # 0 ok, 4 infeasible/failed (acados convention)
    warm: IPWarm | None = None  # final IP state (batched solver only)


# ------------------------------------------------------------------ core --

_BIG = 1e6          # "no bound" sentinel, matches reference bounds usage
_TMIN = 1e-6


def _row_weights(t1, l1, t2, l2, t3, l3, t4, l4, c1, c3, sl, su, soft,
                 zl, zu, Zl, Zu, mu):
    """Effective per-row Hessian weight and gradient after eliminating the
    barrier pairs and (for soft rows) the slack variables.

    Generic IP elimination for c_i(w) >= 0 with pair (t_i, lam_i):
      H_eff += (l/t) grad_c grad_c',   g_eff -= grad_c * gamma_i,
      gamma_i = mu/t_i - (l_i/t_i)(c_i - t_i).
    Soft rows couple the slack sl into c1 with unit gradient; eliminating
    the scalar sl via its diagonal gives (kappa = Zl + d1 + d2):
      d1~ = d1 (Zl + d2)/kappa,
      gamma1~ = gamma1 + (d1/kappa)(zl + Zl sl - gamma1 - gamma2),
    and symmetrically for the upper side. Hard rows: d~=d, gamma~=gamma.
    """
    d1, d2, d3, d4 = l1 / t1, l2 / t2, l3 / t3, l4 / t4
    g1 = mu / t1 - d1 * (c1 - t1)
    g2 = mu / t2 - d2 * (sl - t2)
    g3 = mu / t3 - d3 * (c3 - t3)
    g4 = mu / t4 - d4 * (su - t4)

    kl = Zl + d1 + d2
    ku = Zu + d3 + d4
    gsl = zl + Zl * sl - g1 - g2
    gsu = zu + Zu * su - g3 - g4

    d1s = d1 * (Zl + d2) / kl
    g1s = g1 + (d1 / kl) * gsl
    d3s = d3 * (Zu + d4) / ku
    g3s = g3 + (d3 / ku) * gsu

    d_eff = jnp.where(soft > 0, d1s + d3s, d1 + d3)
    gamma = jnp.where(soft > 0, g1s - g3s, g1 - g3)
    return d_eff, gamma, (d1, d2, d3, d4, g1, g2, g3, g4, kl, ku, gsl, gsu)


def _riccati_solve(A, B, c, dx0, Qb, qb, Rb, rb, Sb):
    """LQR with cross terms via backward Riccati scan + forward rollout.

    Qb (N+1,nx,nx), qb (N+1,nx), Rb (N,nu,nu), rb (N,nu), Sb (N,nx,nu).
    Returns (dx (N+1,nx), du (N,nu)).
    """
    N = Rb.shape[0]
    P_T, p_T = Qb[N], qb[N]

    # f32 safeguard: keep Huu comfortably SPD under single-precision
    # round-off (the backup problem runs lm=0); relative jitter only.
    eps = 1e-5 if A.dtype == jnp.float32 else 0.0

    def backward(carry, inp):
        P, p = carry
        Qk, qk, Rk, rk, Sk, ck = inp
        PA = P @ A
        PB = P @ B
        Huu = Rk + B.T @ PB
        if eps:
            Huu = Huu + (eps * jnp.max(jnp.diagonal(Huu))) \
                * jnp.eye(Huu.shape[0], dtype=Huu.dtype)
        Hux = Sk.T + B.T @ PA
        hu = rk + B.T @ (P @ ck + p)
        L = jnp.linalg.cholesky(Huu)
        K = -jax.scipy.linalg.cho_solve((L, True), Hux)
        kff = -jax.scipy.linalg.cho_solve((L, True), hu)
        Pk = Qk + A.T @ PA + Hux.T @ K
        Pk = 0.5 * (Pk + Pk.T)
        pk = qk + A.T @ (P @ ck + p) + Hux.T @ kff
        return (Pk, pk), (K, kff)

    (_, _), (Ks, kffs) = jax.lax.scan(
        backward, (P_T, p_T),
        (Qb[:N], qb[:N], Rb, rb, Sb, c),
        reverse=True,
    )

    def forward(dx, inp):
        K, kff, ck = inp
        du = K @ dx + kff
        dx_next = A @ dx + B @ du + ck
        return dx_next, (dx, du)

    _, (dxs, dus) = jax.lax.scan(forward, dx0, (Ks, kffs, c))
    dx_final = A @ dxs[-1] + B @ dus[-1] + c[-1]
    dx = jnp.concatenate([dxs, dx_final[None]], axis=0)
    return dx, dus


def solve_qp(data: QPData, iters: int = 20, mu0: float = 1e2,
             mu_decay: float = 0.45, mu_min: float = 1e-9,
             ftb: float = 0.995, hard_tol: float = 1e-6,
             horizon_parallel: bool = False) -> QPSolution:
    """Solve one OCP-QP (vmap for batches). Fixed `iters` Newton steps with
    a geometric barrier schedule — batch-uniform compute, no data-dependent
    control flow (XLA-friendly; mirrors HPIPM's bounded-iteration role with
    qp_max_iter, reference config.yaml:18).

    horizon_parallel=True runs the Riccati sweeps via the associative-scan
    backend (ops/riccati_assoc.py): O(log N) depth instead of O(N) —
    lower latency at small batch, more FLOPs (use the default for large
    batched throughput)."""
    N = data.R.shape[0]
    m = data.h.shape[-1]
    dtype = data.h.dtype
    if dtype == jnp.float32:
        # f32 numerics: keep the barrier and the feasibility verdict above
        # single-precision noise
        mu_min = max(mu_min, 1e-6)
        hard_tol = max(hard_tol, 3e-4)

    act = data.active
    # Inactive rows are replaced by a trivially-feasible template so that
    # their barrier terms are well-conditioned and contribute ~0 (masked).
    h = jnp.where(act > 0, data.h, 0.0)
    lo = jnp.where(act > 0, data.lo, -1.0)
    up = jnp.where(act > 0, data.up, 1.0)
    Cx = data.Cx * act[..., None]
    Cu_full = jnp.concatenate(
        [data.Cu, jnp.zeros_like(data.Cu[:1])], axis=0) * act[..., None]

    # Per-row normalization (exact reformulation): rows with huge gradients
    # (e.g. the NN safe set's v/|v| Jacobian ~1/eps near rest) would
    # otherwise destroy the stage Hessian's conditioning, especially in
    # f32. Soft penalties rescale as zl/s, Zl/s^2; slacks unscale at exit.
    gmax = jnp.maximum(jnp.max(jnp.abs(Cx), axis=-1),
                       jnp.max(jnp.abs(Cu_full), axis=-1))
    rscale = 1.0 / jnp.maximum(1.0, gmax)
    h = h * rscale
    lo = lo * rscale
    up = up * rscale
    Cx = Cx * rscale[..., None]
    Cu_full = Cu_full * rscale[..., None]
    zl_w = data.zl / rscale
    zu_w = data.zu / rscale
    Zl_w = data.Zl / (rscale * rscale)
    Zu_w = data.Zu / (rscale * rscale)

    soft = data.soft * act

    # initial primal slacks/duals
    r0 = h                                    # row values at dw = 0
    c1_0 = r0 - lo
    c3_0 = up - r0
    t1 = jnp.maximum(c1_0, 1.0)
    t3 = jnp.maximum(c3_0, 1.0)
    sl = jnp.zeros_like(h)
    su = jnp.zeros_like(h)
    t2 = jnp.ones_like(h)
    t4 = jnp.ones_like(h)
    mu_init = jnp.asarray(mu0, dtype)
    l1, l2, l3, l4 = (mu_init / t1, mu_init / t2, mu_init / t3, mu_init / t4)

    dx = jnp.zeros_like(data.q)
    du = jnp.zeros_like(data.r)

    Ru_dummy = jnp.eye(data.R.shape[-1], dtype=dtype)

    def iteration(carry, mu):
        dx, du, sl, su, t1, l1, t2, l2, t3, l3, t4, l4 = carry
        du_full = jnp.concatenate([du, jnp.zeros_like(du[:1])], axis=0)
        rowv = h + jnp.einsum("kmi,ki->km", Cx, dx) \
                 + jnp.einsum("kmi,ki->km", Cu_full, du_full)
        c1 = rowv - lo + soft * sl
        c3 = up - rowv + soft * su

        d_eff, gamma, aux = _row_weights(
            t1, l1, t2, l2, t3, l3, t4, l4, c1, c3, sl, su, soft,
            zl_w, zu_w, Zl_w, Zu_w, mu)
        d_eff = d_eff * act
        gamma = gamma * act

        # Newton STEP system around the current iterate:
        #   Hbar = H + G' diag(d_eff) G,
        #   grad = (H w + g) - G' gamma          (cost gradient + barrier)
        # with the dynamics-equality residual carried in the Riccati 'c'
        # term (infeasible-start Newton; the equality error contracts by
        # (1 - alpha) per iteration).
        Qb = data.Q + jnp.einsum("kmi,km,kmj->kij", Cx, d_eff, Cx)
        Rb = data.R + jnp.einsum("kmi,km,kmj->kij", Cu_full[:N], d_eff[:N],
                                 Cu_full[:N])
        Sb = jnp.einsum("kmi,km,kmj->kij", Cx[:N], d_eff[:N], Cu_full[:N])
        qb = data.q + jnp.einsum("kij,kj->ki", data.Q, dx) \
            - jnp.einsum("kmi,km->ki", Cx, gamma)
        rb = data.r + jnp.einsum("kij,kj->ki", data.R, du) \
            - jnp.einsum("kmi,km->ki", Cu_full[:N], gamma[:N])

        c_res = data.c + jnp.einsum("ij,kj->ki", data.A, dx[:N]) \
            + jnp.einsum("ij,kj->ki", data.B, du) - dx[1:]
        dx0_res = data.dx0 - dx[0]

        if horizon_parallel:
            from .riccati_assoc import riccati_assoc
            ddx, ddu = riccati_assoc(
                data.A, data.B, c_res, dx0_res, Qb, qb, Rb, rb, Sb)
        else:
            ddx, ddu = _riccati_solve(
                data.A, data.B, c_res, dx0_res, Qb, qb, Rb, rb, Sb)

        ddu_full = jnp.concatenate([ddu, jnp.zeros_like(ddu[:1])], axis=0)
        drow = jnp.einsum("kmi,ki->km", Cx, ddx) \
            + jnp.einsum("kmi,ki->km", Cu_full, ddu_full)

        d1, d2, d3, d4, g1, g2, g3, g4, kl, ku, gsl, gsu = aux
        # soft slack steps (zero for hard rows)
        dsl = jnp.where(soft > 0, -(gsl + d1 * drow) / kl, 0.0)
        dsu = jnp.where(soft > 0, -(gsu - d3 * drow) / ku, 0.0)

        dc1 = drow + dsl
        dc3 = -drow + dsu
        dt1 = dc1 + (c1 - t1)
        dt3 = dc3 + (c3 - t3)
        dt2 = dsl + (sl - t2)
        dt4 = dsu + (su - t4)
        dl1 = (mu - t1 * l1 - l1 * dt1) / t1
        dl2 = (mu - t2 * l2 - l2 * dt2) / t2
        dl3 = (mu - t3 * l3 - l3 * dt3) / t3
        dl4 = (mu - t4 * l4 - l4 * dt4) / t4

        # fraction-to-boundary step (per problem, min over all pairs)
        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            ratio = jnp.where(act > 0, ratio, jnp.inf)
            return jnp.min(ratio)

        alpha = jnp.minimum(1.0, ftb * jnp.minimum(
            jnp.minimum(jnp.minimum(max_step(t1, dt1), max_step(t2, dt2)),
                        jnp.minimum(max_step(t3, dt3), max_step(t4, dt4))),
            jnp.minimum(jnp.minimum(max_step(l1, dl1), max_step(l2, dl2)),
                        jnp.minimum(max_step(l3, dl3), max_step(l4, dl4)))))

        dx = dx + alpha * ddx
        du = du + alpha * ddu
        sl = sl + alpha * dsl
        su = su + alpha * dsu
        t1, t2 = t1 + alpha * dt1, t2 + alpha * dt2
        t3, t4 = t3 + alpha * dt3, t4 + alpha * dt4
        l1, l2 = l1 + alpha * dl1, l2 + alpha * dl2
        l3, l4 = l3 + alpha * dl3, l4 + alpha * dl4
        t1 = jnp.maximum(t1, _TMIN * 1e-3)
        t2 = jnp.maximum(t2, _TMIN * 1e-3)
        t3 = jnp.maximum(t3, _TMIN * 1e-3)
        t4 = jnp.maximum(t4, _TMIN * 1e-3)
        return (dx, du, sl, su, t1, l1, t2, l2, t3, l3, t4, l4), alpha

    mus = jnp.maximum(mu0 * mu_decay ** jnp.arange(iters, dtype=dtype), mu_min)
    carry = (dx, du, sl, su, t1, l1, t2, l2, t3, l3, t4, l4)
    carry, _ = jax.lax.scan(iteration, carry, mus)
    dx, du, sl, su, t1, l1, t2, l2, t3, l3, t4, l4 = carry

    # residuals / status
    du_full = jnp.concatenate([du, jnp.zeros_like(du[:1])], axis=0)
    rowv = h + jnp.einsum("kmi,ki->km", Cx, dx) \
             + jnp.einsum("kmi,ki->km", Cu_full, du_full)
    viol_lo = jnp.maximum(lo - rowv - soft * sl, 0.0)
    viol_up = jnp.maximum(rowv - soft * su - up, 0.0)
    hard_viol = jnp.max(act * jnp.maximum(viol_lo, viol_up))
    compl = jnp.max(act * (t1 * l1 + t3 * l3))
    nan_bad = jnp.logical_or(jnp.any(jnp.isnan(dx)), jnp.any(jnp.isnan(du)))
    fail = jnp.logical_or(hard_viol > hard_tol, nan_bad)
    status = jnp.where(fail, 4, 0).astype(jnp.int32)
    dx = jnp.where(nan_bad, jnp.zeros_like(dx), dx)
    du = jnp.where(nan_bad, jnp.zeros_like(du), du)
    # unscale soft slacks back to original row units
    return QPSolution(dx=dx, du=du, sl=sl * soft / rscale,
                      su=su * soft / rscale,
                      hard_violation=hard_viol,
                      eq_residual=jnp.zeros((), dtype),
                      stat_residual=compl, status=status)
