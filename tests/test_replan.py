"""StallReplanner mechanics: stall detection, batched long-horizon
replan, guess splice into the controller state (sim/replan.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, \
    get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
from safe_mpc_tpu.sim.replan import StallReplanner
from safe_mpc_tpu.tasks.sampling import sample_initial_states


def test_stall_replan_splices_guesses():
    B, N, Nr = 4, 10, 40
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("naive", model, N=N)
    replan_ctrl = get_guess_controller("naive", model, N=Nr,
                                       rti_iters=40, lm=1e-3)
    rp = StallReplanner(replan_ctrl, ctrl, chunk=B, sqp_iters=40,
                        ik_seeds=2, ik_starts=16)
    assert rp.q_iks is not None and rp.q_iks.shape[1] == model.nx

    sim = ClosedLoopSim(ctrl, backup=None)
    x0s = sample_initial_states(model, B, margin=0.05)
    st = sim.initial_state(x0s)

    # first call only records the error baseline
    st1 = rp.maybe_replan(st)
    assert rp.prev_err is not None and rp.n_replans == 0

    # state unchanged since baseline -> every running problem is stalled
    st2 = rp.maybe_replan(st1)
    assert rp.n_replans == B
    assert rp.n_accepted > 0     # a 40-step plan beats a standing start

    # accepted problems got a fresh guess whose first node is x0 and whose
    # controls come from the replan (non-zero), r reset to N
    changed = np.flatnonzero(
        np.any(np.asarray(st2.ctrl.ug) != np.asarray(st1.ctrl.ug),
               axis=(1, 2)))
    assert changed.size == rp.n_accepted
    np.testing.assert_allclose(np.asarray(st2.ctrl.xg[changed, 0]),
                               np.asarray(x0s)[changed], atol=1e-6)
    assert np.all(np.asarray(st2.ctrl.r)[changed] == N)
    # guess shapes preserved
    assert st2.ctrl.xg.shape == st1.ctrl.xg.shape
    assert st2.ctrl.ug.shape == st1.ctrl.ug.shape

    # accepted problems got guidance: a via point on the plan's EE path
    assert np.all(np.asarray(st2.ctrl.guide_on)[changed])
    assert rp.plan_active[changed].all()
    # the guidance clears once the plan is consumed: emulate arrival by
    # collapsing a plan onto the current EE (nearest node = plan end,
    # within the 3 cm consumption window)
    i = changed[0]
    ee_i = np.asarray(jax.vmap(model.ee_pos)(st2.x))[i]
    rp.plan_ee[i] = np.tile(ee_i, (rp.plan_ee.shape[1], 1))
    rp.prev_err = rp.prev_err + 0.05   # fake progress: no fresh replan
    st3 = rp.maybe_replan(st2)
    assert not bool(np.asarray(st3.ctrl.guide_on)[i])
    assert not rp.plan_active[i]


def test_finisher_splices_near_misses():
    """A near-miss (few mm from the target, at rest, not improving) gets
    a full-SQP finisher solve at the MPC horizon spliced as a fresh
    guess ending sub-0.5*tol_conv, with guidance off — and is NOT sent
    to the long-horizon stall replanner (whose accept_margin exceeds
    the remaining error)."""
    from safe_mpc_tpu.tasks.ik import solve_ik_multistart

    B, N = 2, 20
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("naive", model, N=N)
    replan_ctrl = get_guess_controller("naive", model, N=30, rti_iters=10)
    rp = StallReplanner(replan_ctrl, ctrl, chunk=B, sqp_iters=60,
                        ik_seeds=1, ik_starts=16)

    # build a near-miss state: IK solution of the target, perturbed so
    # the EE sits a few mm off, at rest. The perturbed state must be
    # COLLISION-FREE (the target posture sits close to the cage, and a
    # blanket +8e-3 rad on every joint grazes an obstacle — the finisher
    # then correctly refuses to certify the solve), so scan magnitudes
    # for one inside (tol_conv, finish_tol) that passes check_collision.
    q_tgt, ok = solve_ik_multistart(model, jnp.asarray(model.ee_ref))
    assert bool(ok)
    x_nm = None
    for delta in (0.008, -0.008, 0.006, -0.006, 0.004, -0.004, 0.003):
        cand = np.array(q_tgt, np.float64)
        cand[:model.nq] += delta
        cand[model.nq:] = 0.0
        err0 = float(np.linalg.norm(
            np.asarray(model.ee_pos(jnp.asarray(cand))) -
            np.asarray(model.ee_ref)))
        if cfg.tol_conv < err0 < rp.finish_tol \
                and bool(model.check_collision(jnp.asarray(cand))) \
                and bool(model.check_state_bounds(jnp.asarray(cand))):
            x_nm = cand
            break
    assert x_nm is not None, "no collision-free near-miss state found"

    sim = ClosedLoopSim(ctrl, backup=None)
    x0s = jnp.asarray(np.tile(x_nm[None], (B, 1)))
    st = sim.initial_state(x0s)

    st1 = rp.maybe_replan(st)          # baseline only
    assert rp.n_finishes == 0
    st2 = rp.maybe_replan(st1)         # unchanged state -> finisher fires
    assert rp.n_finishes == B
    assert rp.n_replans == 0           # finisher supersedes stall replan
    assert not np.any(np.asarray(st2.ctrl.guide_on))
    # spliced guess starts at the near-miss state and ends sub-tol
    np.testing.assert_allclose(np.asarray(st2.ctrl.xg[:, 0]),
                               np.asarray(x0s), atol=1e-6)
    ee_T = np.asarray(jax.vmap(model.ee_pos)(st2.ctrl.xg[:, -1]))
    err_T = np.linalg.norm(ee_T - np.asarray(model.ee_ref)[None], axis=1)
    assert np.all(err_T < 0.5 * cfg.tol_conv), f"finisher err_T={err_T}"


def test_replan_noop_when_progressing():
    B, N = 2, 10
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("naive", model, N=N)
    replan_ctrl = get_guess_controller("naive", model, N=20, rti_iters=10)
    rp = StallReplanner(replan_ctrl, ctrl, chunk=B, ik_seeds=1)

    sim = ClosedLoopSim(ctrl, backup=None)
    x0s = sample_initial_states(model, B, margin=0.05)
    st = sim.initial_state(x0s)
    rp.maybe_replan(st)
    # teleport the states 1 cm toward the target in EE terms: fake progress
    rp.prev_err = rp.prev_err + 0.05
    st2 = rp.maybe_replan(st)
    assert rp.n_replans == 0
    assert st2 is st
