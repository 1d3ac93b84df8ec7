"""Controller state-machine tests: abort logic, receding index, rollback,
backup braking — the reference's failure semantics (controller.py §3.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.base import SafeBackupController, STWAController
from safe_mpc_tpu.controllers.registry import (CONTROLLERS, get_controller,
                                               get_guess_controller)
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.ops.sqp import SolveResult

N = 6


@pytest.fixture(scope="module")
def model():
    # analytic safe set: deterministic, no checkpoint needed
    return ManipulatorModel(load_config().with_(N=N, use_net=False))


@pytest.fixture(scope="module")
def x0(model):
    return jnp.zeros(model.nx)


def mk(model, name, **kw):
    kw.setdefault('qp_iters', 10)
    return get_controller(name, model, N=N, **kw)


# --------------------------------------------------------------- smoke ----

@pytest.mark.parametrize("name", sorted(CONTROLLERS))
def test_step_smoke(model, x0, name):
    c = mk(model, name)
    st = c.initial_state(x0)
    res = jax.jit(c.step)(st, x0)
    assert res.u.shape == (model.nu,)
    assert np.all(np.isfinite(np.asarray(res.u)))
    assert res.state.xg.shape == (c.N + 1, model.nx)


def test_step_batched_vmap(model, x0):
    c = mk(model, "receding")
    xs = jnp.stack([x0, x0.at[0].set(0.2), x0.at[1].set(0.5)])
    sts = jax.vmap(c.initial_state)(xs)
    res = jax.jit(jax.vmap(c.step))(sts, xs)
    assert res.u.shape == (3, model.nu)
    single = c.step(jax.tree.map(lambda a: a[1], sts), xs[1])
    np.testing.assert_allclose(np.asarray(res.u[1]), np.asarray(single.u),
                               atol=1e-8)


# ------------------------------------------------- forced-failure rigs ----

class FailingSTWA(STWAController):
    """STWA with solve stubbed to always fail — isolates the state machine."""

    def solve(self, state, x, sched):
        return SolveResult(xs=state.xg, us=state.ug,
                           status=jnp.full((), 4, jnp.int32),
                           qp_viol=jnp.ones(()), iters=jnp.ones((), jnp.int32))


def test_stwa_abort_after_n_minus_1_fails(model, x0):
    c = FailingSTWA(model, N=N)
    st = c.initial_state(x0)
    # seed a recognisable guess so we can track x_viable
    xg = jnp.tile(x0, (N + 1, 1)) + jnp.arange(N + 1)[:, None] * 0.01
    st = c.set_guess(st, xg, st.ug)
    step = jax.jit(c.step)
    aborts = []
    for k in range(N):
        res = step(st, x0)
        aborts.append(bool(res.abort))
        st = res.state
    # fails counts 1..N-1 then the N-th step aborts (controller.py:384)
    assert aborts == [False] * (N - 1) + [True]
    # x_viable captured on the FIRST failure as x_guess[-2]
    # (guess correction re-rolls xg from xg[0], so compare against that)
    xg_corr = c.model.rollout(xg[0], st.ug)
    np.testing.assert_allclose(np.asarray(st.x_viable),
                               np.asarray(xg_corr[-2]), atol=1e-12)


def test_stwa_rollback_replays_shifted_guess(model, x0):
    c = FailingSTWA(model, N=N)
    st = c.initial_state(x0)
    ug = 0.1 * jnp.tile(jnp.arange(1, N + 1, dtype=st.ug.dtype)[:, None],
                        (1, model.nu))
    st = c.set_guess(st, st.xg, ug)
    res = c.step(st, x0)
    # failed solve -> u = u_guess[0], guess shifted by one
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ug[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.state.ug[0]),
                               np.asarray(ug[1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.state.ug[-1]),
                               np.asarray(ug[-1]), atol=1e-12)


# ------------------------------------------------------- receding logic ----

def test_receding_r_advances_when_safe(model, x0):
    # at rest in mid-range the analytic set holds everywhere -> after a
    # successful step, r jumps to N-1 (max safe node N, r = N-1)
    c = mk(model, "receding")
    x = jnp.asarray((model.x_min + model.x_max) / 2).at[model.nq:].set(0.0)
    st = c.initial_state(x)
    res = c.step(st, x)
    assert int(res.status) == 0
    assert int(res.state.r) == N - 1
    assert not bool(res.abort)


def test_receding_aborts_when_r_hits_zero(model, x0):
    class FailingReceding(CONTROLLERS["receding"]):
        def solve(self, state, x, sched):
            return SolveResult(xs=state.xg, us=state.ug,
                               status=jnp.full((), 4, jnp.int32),
                               qp_viol=jnp.ones(()),
                               iters=jnp.ones((), jnp.int32))

    c = FailingReceding(model, N=N)
    st = c.initial_state(x0)
    step = jax.jit(c.step)
    aborts = []
    for k in range(N):
        res = step(st, x0)
        aborts.append(bool(res.abort))
        st = res.state
    # r: N -> N-1 -> ... -> 1; abort fires when the decrement hits 0
    assert aborts == [False] * (N - 1) + [True]
    assert int(st.r) == N       # reset for post-abort resumption
    # viable state is x_guess[1] of the aborting tick (controller.py:484)
    assert np.all(np.isfinite(np.asarray(st.x_viable)))


# ---------------------------------------------------------- backup brake ---

def test_backup_brakes_to_zero_velocity(model):
    c = SafeBackupController(model, N=12, rti_iters=1, qp_iters=12)
    x = jnp.zeros(model.nx)
    x = x.at[1].set(1.5).at[2].set(-0.8)
    x = x.at[model.nq:].set(jnp.asarray([0.5, -0.6, 0.8, -0.3, 0.4]))
    res = c.solve_backup(x, max_iters=20)
    assert int(res.status) == 0
    # terminal velocity pinned to zero
    np.testing.assert_allclose(np.asarray(res.xs[-1, model.nq:]),
                               np.zeros(model.nq), atol=1e-6)
    # torque-feasible braking
    taus = np.stack([np.asarray(model.tau(res.xs[k], res.us[k]))
                     for k in range(c.N)])
    assert np.all(np.abs(taus) <= model.tau_max + 1e-4)


# ----------------------------------------------------------- guess mode ----

def test_guess_registry_maps_safe_to_htwa(model):
    g = get_guess_controller("receding", model, N=N, rti_iters=40)
    assert type(g).__name__ == "HTWAController"
    assert g.rti_iters == 40


# ---------------------------------------------- batched-step equivalence ----

@pytest.mark.parametrize("name", sorted(CONTROLLERS))
def test_step_batched_matches_vmapped_step(model, x0, name):
    """step_batched (lane-packed transcribe_bl + solve_qp_bl, per-problem
    schedules) must reproduce vmap(step) exactly — the equivalence that
    licenses the simulator's batched hot path."""
    c = mk(model, name)
    xs = jnp.stack([x0, x0.at[0].set(0.2), x0.at[1].set(0.5)])
    sts = jax.vmap(c.initial_state)(xs)
    # advance two ticks so receding/parallel state machines diverge
    for _ in range(2):
        res_v = jax.jit(jax.vmap(c.step))(sts, xs)
        res_b = jax.jit(c.step_batched)(sts, xs)
        np.testing.assert_allclose(np.asarray(res_b.u),
                                   np.asarray(res_v.u), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(res_b.status),
                                      np.asarray(res_v.status))
        np.testing.assert_array_equal(np.asarray(res_b.abort),
                                      np.asarray(res_v.abort))
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
            res_b.state, res_v.state)
        sts = res_b.state


def test_step_batched_rti3_matches_vmapped(model, x0):
    """Multi-iteration (full SQP) batched step == vmapped step."""
    c = mk(model, "receding", rti_iters=3)
    xs = jnp.stack([x0, x0.at[0].set(0.2)])
    sts = jax.vmap(c.initial_state)(xs)
    res_v = jax.jit(jax.vmap(c.step))(sts, xs)
    res_b = jax.jit(c.step_batched)(sts, xs)
    np.testing.assert_allclose(np.asarray(res_b.u), np.asarray(res_v.u),
                               atol=1e-9)
    np.testing.assert_array_equal(np.asarray(res_b.status),
                                  np.asarray(res_v.status))


def test_backup_batched_matches_vmapped(model):
    bk = SafeBackupController(model, N=N, qp_iters=10)
    xv = jnp.stack([
        jnp.zeros(model.nx).at[model.nq:].set(0.3),
        jnp.zeros(model.nx).at[model.nq:].set(-0.2).at[1].set(0.5)])
    rb = jax.jit(lambda x: bk.solve_backup_batched(x, max_iters=5))(xv)
    rv = jax.jit(jax.vmap(lambda x: bk.solve_backup(x, max_iters=5)))(xv)
    # batch-last reorders float contractions; agreement is algebraic,
    # not bitwise
    np.testing.assert_allclose(np.asarray(rb.xs), np.asarray(rv.xs),
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(rb.status),
                                  np.asarray(rv.status))


def test_lm_drop_near_target(model):
    """With lm_drop_tol set, the schedule's lm_scale drops to
    lm_drop_factor when the guess head is within tol of the EE target,
    and stays 1.0 when far or under plan guidance (the LM-drop is a
    finishing aid, not a transit behavior)."""
    import dataclasses

    from safe_mpc_tpu.controllers.base import MPCController

    mid = jnp.asarray((model.x_min + model.x_max) / 2).at[model.nq:].set(0.0)
    ee_mid = np.asarray(model.ee_pos(mid))
    cfg2 = model.cfg.with_(ee_ref=tuple(float(v) for v in ee_mid))
    model2 = ManipulatorModel(cfg2)
    ctrl = MPCController(model2, N=N, lm_drop_tol=5e-3, lm_drop_factor=0.02)

    st_near = ctrl.initial_state(mid)
    assert float(ctrl.schedule(st_near).lm_scale) == pytest.approx(0.02)

    far = mid.at[0].add(0.4)
    st_far = ctrl.initial_state(far)
    assert float(ctrl.schedule(st_far).lm_scale) == 1.0

    # guidance overrides the drop (transit, not finishing)
    st_guided = dataclasses.replace(st_near, guide_on=jnp.asarray(True))
    assert float(ctrl.schedule(st_guided).lm_scale) == 1.0

    # default (lm_drop_tol=0): always 1.0
    ctrl0 = MPCController(model2, N=N)
    assert float(ctrl0.schedule(st_near).lm_scale) == 1.0
