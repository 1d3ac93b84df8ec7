"""Warm-started RTI chain vs cold per-tick solves on the real Z1 OCP.

Measures what the headline bench will claim: control agreement, status
health, and terminal convergence of a warm-carry chain (WARM_ITERS per
tick after one cold tick) against the production cold schedule (15
iters per tick), in f32 (the TPU regime)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update('jax_platforms', 'cpu')
import dataclasses
import numpy as np
import jax.numpy as jnp

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.ops.sqp import rti_step_batched
from safe_mpc_tpu.tasks.sampling import sample_initial_states

N, B, K = 25, 8, 60
cfg = load_config().with_(N=N, use_net=True, alpha=10.0)
model = ManipulatorModel(cfg)
ctrl = get_controller("receding", model, N=N)
x0s = sample_initial_states(model, B, margin=0.05).astype(jnp.float32)
states0 = jax.vmap(lambda x: ctrl.initial_state(x))(x0s)
sched = ctrl.schedule(ctrl.initial_state(
    jnp.asarray((model.x_min + model.x_max) / 2, jnp.float32)))

def plant(x, u):
    return model.step(x, u)

@jax.jit
def tick_cold(st, xs):
    res = rti_step_batched(ctrl.spec, st.xg, st.ug, xs, sched, qp_iters=15)
    st = dataclasses.replace(st, xg=res.xs, ug=res.us)
    return st, res.us[:, 0], res.status

import os
WI = int(os.environ.get("WI", "8"))

@jax.jit
def tick_warm(st, xs, warm):
    res, w = rti_step_batched(ctrl.spec, st.xg, st.ug, xs, sched,
                              warm=warm, warm_iters=WI, with_warm=True)
    st = dataclasses.replace(st, xg=res.xs, ug=res.us)
    return st, res.us[:, 0], res.status, w, res.qp_viol

# closed loops: guess shift per tick like provideControl
def shift(st):
    xg = jnp.roll(st.xg, -1, axis=1).at[:, -1].set(st.xg[:, -1])
    ug = jnp.roll(st.ug, -1, axis=1).at[:, -1].set(st.ug[:, -1])
    return dataclasses.replace(st, xg=xg, ug=ug)

from safe_mpc_tpu.ops.qp import shift_warm

stc, stw = states0, states0
xc = xw = x0s
warm = None
du_max, bad_c, bad_w = 0.0, 0, 0
for k in range(K):
    stc2, uc, sc = tick_cold(stc, xc)
    if warm is None:
        stw2, uw, sw = tick_cold(stw, xw)
        # produce warm from a cold tick
        res, warm = rti_step_batched(ctrl.spec, stw.xg, stw.ug, xw, sched,
                                     qp_iters=15, with_warm=True)
        stw2 = dataclasses.replace(stw, xg=res.xs, ug=res.us)
        uw, sw = res.us[:, 0], res.status
    else:
        stw2, uw, sw, warm, viol = tick_warm(stw, xw, warm)
        nb=int(jnp.sum(sw != 0))
        if nb: print(f"  k={k}: {nb} warm fails, viol={np.asarray(viol)[np.asarray(sw)!=0]}")
    du = float(jnp.max(jnp.abs(uc - uw)))
    du_max = max(du_max, du)
    bad_c += int(jnp.sum(sc != 0)); bad_w += int(jnp.sum(sw != 0))
    xc = jax.vmap(plant)(xc, uc)
    xw = jax.vmap(plant)(xw, uw)
    stc = shift(stc2); stw = shift(stw2)
    warm = shift_warm(warm, axis=0)
    if k % 10 == 0:
        ee_c = jnp.linalg.norm(jax.vmap(model.ee_pos)(xc) - jnp.asarray(model.ee_ref)[None], axis=1)
        ee_w = jnp.linalg.norm(jax.vmap(model.ee_pos)(xw) - jnp.asarray(model.ee_ref)[None], axis=1)
        print(f"k={k:3d} du={du:.2e} err_cold={np.asarray(ee_c).max():.4f} err_warm={np.asarray(ee_w).max():.4f}")

ee_c = jnp.linalg.norm(jax.vmap(model.ee_pos)(xc) - jnp.asarray(model.ee_ref)[None], axis=1)
ee_w = jnp.linalg.norm(jax.vmap(model.ee_pos)(xw) - jnp.asarray(model.ee_ref)[None], axis=1)
print("final err cold:", np.round(np.asarray(ee_c), 4))
print("final err warm:", np.round(np.asarray(ee_w), 4))
print(f"du_max={du_max:.3e}  bad_cold={bad_c} bad_warm={bad_w} of {B*K}")
