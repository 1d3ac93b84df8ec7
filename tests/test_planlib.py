"""Offline plan library (apps/plan_library.py + sim/replan.py): seed
splice, stall re-attach, and journal JSON hygiene.

Round-4 census: f64 escape plans spliced at t=0 won 24/24 while
mid-episode launches spliced 0/8 — so the library pre-solves every
problem's long-horizon f64 plan at guess time (the reference keeps its
initializer stage offline too, guess_acados.py:98-165) and the online
machinery consumes it with zero solves."""

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import (get_controller,
                                               get_guess_controller)
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
from safe_mpc_tpu.sim.replan import (PMODE_PLAN, PMODE_TRACK,
                                     StallReplanner)
from safe_mpc_tpu.tasks.sampling import sample_initial_states


def _make(B=3, N=8, Nr=16, lib_len=40, **rp_kw):
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("naive", model, N=N)
    replan_ctrl = get_guess_controller("naive", model, N=Nr, rti_iters=10)
    x0s = sample_initial_states(model, B, margin=0.05)
    # synthetic library: per problem a "plan" that walks from x0 toward
    # a shifted state (content irrelevant — acceptance uses the stored
    # status/err_T verdicts; the splice machinery only needs shapes)
    nx, nu = model.nx, model.nu
    xs = np.zeros((B, lib_len + 1, nx))
    x0n = np.asarray(x0s)
    for i in range(B):
        t = np.linspace(0.0, 1.0, lib_len + 1)[:, None]
        xs[i] = x0n[i][None] + 0.3 * t * np.ones(nx)[None]
    lib = {
        "xs": xs, "us": np.zeros((B, lib_len, nu)),
        "length": np.full(B, lib_len), "status": np.zeros(B, int),
        "err_T": np.full(B, 1e-3), "viol": np.zeros(B), "x0": x0n,
    }
    rp = StallReplanner(replan_ctrl, ctrl, chunk=B, ik_seeds=1,
                        ik_starts=16, library=lib, **rp_kw)
    rp.use_f64 = False
    sim = ClosedLoopSim(ctrl, backup=None)
    st = sim.initial_state(x0s)
    rp._ensure_plan_store(B)
    return rp, sim, st, model


def test_seed_from_library_splices_and_plans():
    rp, sim, st, model = _make()
    B = st.x.shape[0]
    st2 = rp.seed_plans(st)
    # every problem's library plan is good (err_T 1 mm) -> all splice
    assert np.all(rp.pmode == PMODE_PLAN)
    assert np.all(np.asarray(st2.ctrl.guide_on))
    # guess = the plan's first N+1 nodes
    np.testing.assert_allclose(np.asarray(st2.ctrl.xg),
                               rp.library["xs"][:, :rp.ctrl.N + 1],
                               rtol=0, atol=1e-6)
    # journal records the library splice
    kinds = [e["kind"] for e in rp.events]
    assert "splice:lib_seed" in kinds


def test_seed_library_stale_x0_falls_through():
    rp, sim, st, model = _make()
    # corrupt problem 1's stored x0 -> must NOT splice from the library
    rp.library["x0"][1] += 0.5
    rp.library["good"][2] = False   # bad verdict -> must not splice
    st2 = rp.seed_plans(st)
    assert rp.pmode[0] == PMODE_PLAN
    ev = [e for e in rp.events if e["kind"] == "splice:lib_seed"]
    assert ev and 1 not in ev[0]["problems"] and 2 not in ev[0]["problems"]


def test_library_attach_suffix_and_tries_cap():
    rp, sim, st, model = _make()
    B = st.x.shape[0]
    err = np.full(B, 0.5)
    # park problem 0 exactly ON node 7 of problem 2's library plan
    k = 7
    x_new = np.asarray(st.x).copy()
    x_new[0] = rp.library["xs"][2, k] + 1e-3
    st = dataclasses.replace(st, x=jnp.asarray(x_new, st.x.dtype))
    st2, acc = rp._library_attach(st, np.array([0]), err)
    assert acc[0]
    assert rp.pmode[0] == PMODE_PLAN
    # spliced guess = plan suffix from node k
    np.testing.assert_allclose(
        np.asarray(st2.ctrl.xg)[0],
        rp.library["xs"][2, k:k + rp.ctrl.N + 1], rtol=0, atol=5e-3)
    # a problem FAR from every plan is not attached
    x_far = np.asarray(st2.x).copy()
    x_far[1] += 2.5    # > lib_attach_tol from every plan node
    st2 = dataclasses.replace(st2, x=jnp.asarray(x_far, st2.x.dtype))
    st3, acc3 = rp._library_attach(st2, np.array([1]), err)
    assert not acc3[1]
    # tries cap: after lib_attach_max attempts the problem escalates
    rp.lib_attach_tries[1] = rp.lib_attach_max
    n_ev = len(rp.events)
    st4, acc4 = rp._library_attach(st3, np.array([1]), err)
    assert not acc4[1]
    assert len(rp.events) == n_ev   # capped problems skip the search


def test_event_journal_is_strict_json():
    rp, sim, st, model = _make()
    rp._ev("test", np.array([0, 1]),
           err_T=np.array([np.nan, np.inf]), v=float("nan"))
    s = json.dumps(rp.events, allow_nan=False)   # must not raise
    back = json.loads(s)
    assert back[-1]["err_T"] == [None, None]
    assert back[-1]["v"] is None


def test_padded_library_trims_to_real_length():
    """Regression: apps/plan_library.py stores plans tail-padded to a
    fixed N_PAD (480) while the guidance buffers are sized from the max
    REAL plan length — an un-trimmed load crashed the flagship seed
    splice with a (B, 481, 3) vs (B, 321, 3) shape mismatch."""
    real_len = 24
    rp, sim, st, model = _make(lib_len=real_len)
    # re-load the same library with 500-node padded storage (longer
    # than plan_len = max(Nr, f64_N, real) + 1 = 321)
    pad_to = 500
    lib = rp.library
    B, _, nx = lib["xs"].shape
    nu = lib["us"].shape[2]
    xs_p = np.concatenate(
        [lib["xs"], np.repeat(lib["xs"][:, -1:], pad_to - real_len,
                              axis=1)], axis=1)
    us_p = np.concatenate(
        [lib["us"], np.zeros((B, pad_to - real_len, nu))], axis=1)
    padded = {"xs": xs_p, "us": us_p,
              "length": np.full(B, real_len), "status": lib["status"],
              "err_T": lib["err_T"], "viol": lib["viol"],
              "x0": lib["x0"]}
    rp.load_library(padded)
    assert rp.library["xs"].shape[1] == real_len + 1
    assert rp.library["us"].shape[1] == real_len
    st2 = rp.seed_plans(st)      # must not raise
    assert np.all(np.asarray(st2.ctrl.guide_on))
