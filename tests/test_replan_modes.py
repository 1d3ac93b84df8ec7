"""StallReplanner mode machine (sim/replan.py class docstring): one
explicit per-problem mode with a documented transition table, replacing
the round-3 mask thicket (VERDICT r3 task 9). Pins the invariants:

  * a certified finisher splice is TERMINAL — the problem is never
    braked, parked, or stall-replanned afterwards, and no later f64
    harvest overwrites its guess;
  * a HELD problem is excluded from finisher/brake/stall until its
    harvest releases it;
  * HELD -> TRACK on a rejected harvest, HELD -> PLAN on an accepted
    one, and the hold timeout releases a starved HELD problem.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, \
    get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
from safe_mpc_tpu.sim.replan import (PMODE_FINI, PMODE_HELD, PMODE_PLAN,
                                     PMODE_TRACK, StallReplanner)
from safe_mpc_tpu.tasks.sampling import sample_initial_states


def _make(B=3, N=8, Nr=16):
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("naive", model, N=N)
    replan_ctrl = get_guess_controller("naive", model, N=Nr, rti_iters=10)
    rp = StallReplanner(replan_ctrl, ctrl, chunk=B, ik_seeds=1,
                        ik_starts=16)
    rp.use_f64 = False
    sim = ClosedLoopSim(ctrl, backup=None)
    x0s = sample_initial_states(model, B, margin=0.05)
    st = sim.initial_state(x0s)
    rp._ensure_plan_store(B)
    return rp, sim, st, model


class _DoneJob:
    def __init__(self, out):
        self._out = out
        self.sel = out[0]

    def poll(self):
        return self._out


def test_fini_is_terminal_for_brake_park_and_stall():
    rp, sim, st, model = _make()
    B = st.x.shape[0]
    # force problem 0 into FINI
    rp.pmode[0] = PMODE_FINI
    # parking a FINI problem violates the invariant -> assertion
    try:
        rp._hold(st, np.array([0]))
        raised = False
    except AssertionError:
        raised = True
    assert raised

    # a stalled-looking batch: FINI problem 0 must not be replanned
    rp.prev_err = np.full(B, 1.0)   # no progress vs huge prior error
    n_before = rp.n_replans
    st2 = rp.maybe_replan(st)
    assert rp.pmode[0] == PMODE_FINI          # unchanged
    # problem 0 got no new guess (others may have)
    assert np.array_equal(np.asarray(st2.ctrl.ug[0]),
                          np.asarray(st.ctrl.ug[0]))
    assert rp.n_replans >= n_before


def test_f64_harvest_never_overwrites_fini_guess():
    rp, sim, st, model = _make()
    nx, nu = model.nx, model.nu
    rp.pmode[0] = PMODE_FINI
    Nr = 16
    # a perfect fake plan for problem 0: feasible, err_T = 0
    xs = np.tile(np.asarray(st.x)[0], (1, Nr + 1, 1))
    out = (np.array([0]), np.asarray(st.x)[:1], xs,
           np.zeros((1, Nr, nu)), np.zeros(1, int), np.zeros(1),
           np.zeros(1))
    rp._f64_jobs = [_DoneJob(out)]
    err = np.full(st.x.shape[0], 1.0)
    st2 = rp._harvest_f64(st, err)
    assert rp.pmode[0] == PMODE_FINI
    assert np.array_equal(np.asarray(st2.ctrl.xg[0]),
                          np.asarray(st.ctrl.xg[0]))


def test_held_transitions_and_timeout():
    rp, sim, st, model = _make()
    B = st.x.shape[0]
    st1 = rp._hold(st, np.array([0]))
    assert rp.pmode[0] == PMODE_HELD

    # HELD is excluded from stall detection
    rp.prev_err = np.full(B, 1.0)
    rp.maybe_replan(st1)
    assert rp.pmode[0] in (PMODE_HELD, PMODE_TRACK)  # timeout may release

    # rejected harvest: HELD -> TRACK
    rp.pmode[0] = PMODE_HELD
    out = (np.array([0]), np.asarray(st1.x)[:1],
           np.zeros((1, 17, model.nx)), np.zeros((1, 16, model.nu)),
           np.full(1, 4), np.full(1, np.inf), np.full(1, np.inf))
    rp._f64_jobs = [_DoneJob(out)]
    rp._harvest_f64(st1, np.full(B, 1.0))
    assert rp.pmode[0] == PMODE_TRACK

    # hold timeout releases a starved HELD problem
    st2 = rp._hold(st1, np.array([1]))
    rp.hold_rounds[1] = rp.hold_max_rounds + 1
    rp.prev_err = np.full(B, 1.0)
    rp.maybe_replan(st2)
    assert rp.pmode[1] != PMODE_HELD


def test_plan_handover_to_track_near_target():
    rp, sim, st, model = _make()
    B = st.x.shape[0]
    # fake an active plan for problem 0 whose path sits AT the problem's
    # current EE (so retiming finds it) and whose end is the current EE
    # (d[T] < 0.03 -> handover)
    ee = np.asarray(jax.vmap(model.ee_pos)(st.x))
    rp.pmode[0] = PMODE_PLAN
    rp.plan_ee[0] = ee[0][None]
    guide_on = np.asarray(st.ctrl.guide_on).copy()
    guide_on[0] = True
    st = dataclasses.replace(st, ctrl=dataclasses.replace(
        st.ctrl, guide_on=jnp.asarray(guide_on)))
    st2, _ = rp._update_guidance(st, ee,
                                 np.full(B, 1.0))
    assert rp.pmode[0] == PMODE_TRACK
    assert not bool(np.asarray(st2.ctrl.guide_on)[0])
