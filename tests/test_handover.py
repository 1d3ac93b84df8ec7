"""In-graph guidance handover (MPCController.schedule, handover_tol).

The host-side handover (sim/replan.py::_update_guidance) releases
guidance only at segment hooks; handover_tol releases it tick-by-tick
once the TRUE task error enters the greedy basin, so the near-target
machinery (wv damping, LM drop) activates even after the last hook.

Pins: handover_tol=0 keeps guided schedules bit-identical (default);
a guided state inside the radius gets the task reference + active
near-target gates; a guided state outside keeps its plan and gates off.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel


def _guided_state(ctrl, model, x, plan_point):
    st = ctrl.initial_state(jnp.asarray(x))
    P = ctrl.guide_len
    p_guide = jnp.tile(jnp.asarray(plan_point, st.xg.dtype)[None], (P, 1))
    return dataclasses.replace(st, p_guide=p_guide,
                               guide_on=jnp.ones((), bool))


def _setup(**kw):
    cfg = load_config().with_(N=8, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("receding", model, N=8, guide_len=4,
                          wv_near_tol=2e-2, lm_drop_tol=5e-3, **kw)
    # a state whose EE sits ON the task target (err_task ~ 0) and a
    # plan point far away from it
    q_mid = np.asarray((model.x_min + model.x_max) / 2)[: model.nx]
    x_near = np.asarray(q_mid).copy()
    # place the task ref at this state's own EE so err_task == 0
    ee_here = np.asarray(model.ee_pos(jnp.asarray(x_near)))
    model2 = ManipulatorModel(cfg.with_(ee_ref=tuple(ee_here.tolist())))
    ctrl2 = get_controller("receding", model2, N=8, guide_len=4,
                           wv_near_tol=2e-2, lm_drop_tol=5e-3, **kw)
    far_point = ee_here + np.array([0.3, 0.2, 0.1])
    return model2, ctrl2, x_near, ee_here, far_point


def test_handover_zero_keeps_guided_schedule():
    model, ctrl, x, ee_here, far_point = _setup(handover_tol=0.0)
    st = _guided_state(ctrl, model, x, far_point)
    s = ctrl.schedule(st)
    np.testing.assert_allclose(np.asarray(s.p_ee[0]), far_point, atol=1e-6)
    assert float(s.wv_term) == 0.0          # gates off while guided
    assert float(s.lm_scale) == 1.0


def test_handover_inside_radius_releases_guidance():
    model, ctrl, x, ee_here, far_point = _setup(handover_tol=0.025)
    st = _guided_state(ctrl, model, x, far_point)
    s = ctrl.schedule(st)
    # err_task == 0 < 0.025: the plan is ignored, the task ref returns,
    # and the near-target machinery activates
    np.testing.assert_allclose(np.asarray(s.p_ee[0]), ee_here, atol=1e-6)
    assert float(s.wv_term) == ctrl.wv_weight
    assert float(s.lm_scale) == ctrl.lm_drop_factor


def test_handover_outside_radius_keeps_plan():
    model, ctrl, x, ee_here, far_point = _setup(handover_tol=0.025)
    # move the task target 10 cm away from the EE: err_task = 0.1 > tol
    model3 = ManipulatorModel(
        model.cfg.with_(ee_ref=tuple((ee_here + np.array([0.1, 0, 0]))
                                     .tolist())))
    ctrl3 = get_controller("receding", model3, N=8, guide_len=4,
                           wv_near_tol=2e-2, lm_drop_tol=5e-3,
                           handover_tol=0.025)
    st = _guided_state(ctrl3, model3, x, far_point)
    s = ctrl3.schedule(st)
    np.testing.assert_allclose(np.asarray(s.p_ee[0]), far_point, atol=1e-6)
    assert float(s.wv_term) == 0.0
    assert float(s.lm_scale) == 1.0


def test_unguided_schedule_unchanged_by_handover():
    """handover_tol must not alter UNGUIDED schedules at all."""
    model, ctrl, x, ee_here, far_point = _setup(handover_tol=0.025)
    ctrl0 = get_controller("receding", model, N=8, guide_len=4,
                           wv_near_tol=2e-2, lm_drop_tol=5e-3,
                           handover_tol=0.0)
    st = ctrl.initial_state(jnp.asarray(x))
    s1, s0 = ctrl.schedule(st), ctrl0.schedule(st)
    for f in s0.__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(s0, f)),
                                      np.asarray(getattr(s1, f)), err_msg=f)
