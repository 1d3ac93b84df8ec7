"""Trajectory-level behavioral parity evidence (BASELINE.md target:
max control deviation < 1e-3 vs an independent oracle; SURVEY §4
"RTI-step equivalence tests vs recorded reference trajectories").

Two layers of evidence above the QP level (the QP itself is already
pinned against scipy trust-constr and native/riccati.cc):

1. ``test_sqp_matches_scipy_nlp`` — the full nonlinear OCP (EE cost +
   torque + collision rows + dynamics) at small N, solved independently
   by scipy trust-constr over the raw decision variables, compared to
   ``sqp_solve``. This is the independent full-OCP oracle: the two
   optimizers share NO solver code (reference analogue: acados SQP vs
   IPOPT agreeing on the same OCP, mpc.py vs mpc_ipopt.py).

2. ``test_f32_rti_closed_loop_matches_f64`` — golden closed-loop
   trajectories from the f64 CPU path vs the f32 path (what the TPU
   executes) on the receding controller: max control deviation < 1e-3
   over 100 steps x 10 problems (BASELINE.md:27).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.base import MPCController
from safe_mpc_tpu.controllers.registry import get_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.ops.sqp import sqp_solve
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
from safe_mpc_tpu.tasks.sampling import sample_initial_states


# --------------------------------------------------------------- NLP oracle


def test_sqp_matches_scipy_nlp():
    """sqp_solve vs scipy trust-constr on the raw nonlinear OCP (N=5)."""
    from scipy.optimize import LinearConstraint, NonlinearConstraint, minimize

    N = 5
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    # R=1.0 (vs the production 5e-3): the 5-DOF arm is redundant for a
    # 3-D EE target, so with a tiny u-weight the OCP has a near-flat
    # valley of minimizers and two independent solvers legitimately land
    # on different points. A strictly convex instance has a UNIQUE
    # optimum, making pointwise solver equivalence well-posed. (Solver
    # parity holds for any instance; this just makes it checkable.)
    ctrl = MPCController(model, N=N, R=1.0)  # naive: EE cost, tau + collision
    spec = ctrl.spec
    nx, nu, m = spec.nx, spec.nu, spec.m

    # start away from rest so torque rows carry real dynamics, and aim at
    # a nearby reachable EE target: the 25 ms OCP is then well-conditioned
    # (small GN residual at the optimum, no nonconvex constraint actives),
    # so two independent solvers must agree tightly. Far-target instances
    # have long curved valleys where BOTH creep (measured: scipy and
    # sqp_solve each keep improving past 400 iterations) — not a usable
    # equivalence instance.
    x0 = jnp.asarray((model.x_min + model.x_max) / 2)
    x0 = x0.at[0].add(0.25).at[1].add(-0.2).at[model.nq].set(0.3)
    state = ctrl.guess_correction(ctrl.initial_state(x0))
    sched = ctrl.schedule(state)
    p_near = model.ee_pos(x0) + jnp.asarray([0.002, -0.002, 0.001])
    sched = dataclasses.replace(
        sched, p_ee=jnp.tile(p_near[None], (N + 1, 1)))

    res = sqp_solve(spec, state.xg, state.ug, x0, sched,
                    max_iters=60, qp_iters=40, tol=1e-10)
    assert int(res.status) == 0

    # ---- independent scipy NLP over z = [X.flat, U.flat]
    n_x = (N + 1) * nx
    n_z = n_x + N * nu

    def unpack(z):
        return z[:n_x].reshape(N + 1, nx), z[n_x:].reshape(N, nu)

    @jax.jit
    def f_cost(z):
        X, U = unpack(z)
        return spec.total_cost(X, U, sched.p_ee)

    g_cost = jax.jit(jax.grad(f_cost))

    # linear dynamics (double integrator is exactly linear): X0 = x0 and
    # X[k+1] = A X[k] + B U[k]
    A, B = np.asarray(spec.A), np.asarray(spec.B)
    Aeq = np.zeros((nx + N * nx, n_z))
    beq = np.zeros(nx + N * nx)
    Aeq[:nx, :nx] = np.eye(nx)
    beq[:nx] = np.asarray(x0)
    for k in range(N):
        r0 = nx + k * nx
        Aeq[r0:r0 + nx, (k + 1) * nx:(k + 2) * nx] = np.eye(nx)
        Aeq[r0:r0 + nx, k * nx:(k + 1) * nx] = -A
        Aeq[r0:r0 + nx, n_x + k * nu:n_x + (k + 1) * nu] = -B

    # row values per node; bounds/activity from the transcription itself
    data = spec.transcribe(state.xg, state.ug, x0, sched)
    act = np.asarray(data.active, bool)
    lo = np.where(act, np.asarray(data.lo), -np.inf).ravel()
    up = np.where(act, np.asarray(data.up), np.inf).ravel()

    @jax.jit
    def f_rows(z):
        X, U = unpack(z)
        Uf = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
        return jax.vmap(lambda x, u: spec._constraint_values(
            x, u, sched.alpha))(X, Uf).ravel()

    j_rows = jax.jit(jax.jacfwd(f_rows))

    z_sqp = np.concatenate([np.asarray(res.xs).ravel(),
                            np.asarray(res.us).ravel()])
    c_sqp = float(f_cost(z_sqp))

    # (1) our solution is feasible in the INDEPENDENT formulation
    np.testing.assert_allclose(Aeq @ z_sqp, beq, atol=1e-8)
    rows = np.asarray(f_rows(z_sqp))
    assert np.all(rows >= lo - 1e-7) and np.all(rows <= up + 1e-7)

    # (2) the independent solver, started from the SAME guess, lands on
    # the same optimum: controls/states agree and neither cost dominates
    z0 = np.concatenate([np.asarray(state.xg).ravel(),
                         np.asarray(state.ug).ravel()])
    out = minimize(
        lambda z: float(f_cost(z)), z0,
        jac=lambda z: np.asarray(g_cost(z)),
        method="trust-constr",
        constraints=[
            LinearConstraint(Aeq, beq, beq),
            NonlinearConstraint(
                lambda z: np.asarray(f_rows(z)), lo, up,
                jac=lambda z: np.asarray(j_rows(z))),
        ],
        options={"gtol": 1e-12, "xtol": 1e-14, "maxiter": 1000})
    X_sp, U_sp = unpack(out.x)
    np.testing.assert_allclose(np.asarray(res.us), U_sp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.xs), X_sp, atol=1e-5)
    assert abs(c_sqp - out.fun) < 1e-7 * max(1.0, abs(out.fun))


# ------------------------------------------------------- f32 vs f64 golden


@pytest.mark.parametrize("controller", ["receding"])
def test_f32_rti_closed_loop_matches_f64(controller):
    """Golden f64 closed loop vs the f32 path the TPU runs: max |u32-u64|
    < 1e-3 over 100 steps on 10 problems (BASELINE.md:27)."""
    N, B, steps = 10, 10, 100
    cfg = load_config().with_(N=N, use_net=False, back_hor=N,
                              control_noise=0.0, noise=0.0)
    model = ManipulatorModel(cfg)
    ctrl = get_controller(controller, model, N=N)
    x0s64 = sample_initial_states(model, B, margin=0.05)
    assert x0s64.dtype == jnp.float64

    def run(x0s):
        sim = ClosedLoopSim(ctrl, backup=None)
        return sim.run(x0s, n_steps=steps, segment=None)

    res64 = run(x0s64)
    res32 = run(x0s64.astype(jnp.float32))
    assert res32.us.dtype == np.float32   # the whole loop stayed f32

    # compare controls where both paths are still alive (us is NaN after a
    # problem finishes; finite-region intersection)
    mask = np.isfinite(res64.us) & np.isfinite(res32.us)
    assert mask.mean() > 0.9, "paths died early — not a meaningful compare"
    dev_u = np.max(np.abs(np.where(mask, res64.us - res32.us, 0.0)))
    dev_x = np.max(np.abs(np.where(
        np.isfinite(res64.xs) & np.isfinite(res32.xs),
        res64.xs - res32.xs, 0.0)))
    assert dev_u < 1e-3, f"control deviation {dev_u:.2e} >= 1e-3"
    assert dev_x < 1e-2, f"state deviation {dev_x:.2e}"

    # and the outcome classification agrees problem-for-problem
    assert res64.conv_idx == res32.conv_idx
    assert res64.collisions_idx == res32.collisions_idx
