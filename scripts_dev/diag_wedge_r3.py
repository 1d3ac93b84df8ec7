"""Round-3 wedge diagnosis: which escape recipe cracks the 53.4/108.7 mm
wedges? Takes the at-rest wedged final states from the flagship pickle
and tries: (a) on-device f32 escape solves with each IK-branch guess,
(b) kinematic feasibility of the PD-tracked IK paths themselves
(guidance-only candidate: no SQP needed if the path is collision-free).

Usage: python scripts_dev/diag_wedge_r3.py [--cpu]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import pickle
import numpy as np

force_cpu = "--cpu" in sys.argv
import jax
if force_cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "generated", f"xla_cache_diag")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
import jax.numpy as jnp

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.replan import StallReplanner
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim

cfg = load_config().with_(N=45, use_net=True)
if not force_cpu:
    cfg = cfg.with_(dtype="float32")
model = ManipulatorModel(cfg)
jdt = jnp.float32

d = pickle.load(open('data_noise/scratch_flagship/z1_receding_use_netTrue_45hor_10sm_noise_0.0_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl','rb'))
xT = d['x'][:, -1]
ee = np.asarray(jax.vmap(model.ee_pos)(jnp.asarray(xT, jdt)))
err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
vmax = np.abs(xT[:, model.nq:]).max(axis=1)
wedged = np.flatnonzero((err > 0.02) & (err < 0.12) & (vmax < 0.3))
print(f"wedged at-rest problems: {wedged.tolist()}")
print(f"errs: {np.round(err[wedged]*1000,1)}")

Nr = 240
ctrl = get_controller("receding", model, N=45)
replan_ctrl = get_guess_controller("receding", model, N=Nr, rti_iters=60, lm=1e-3)
rp = StallReplanner(replan_ctrl, ctrl, chunk=16, sqp_iters=150, qp_iters=40)

B = 16
sel = wedged[:B]
pad = B - sel.size
sel_p = np.concatenate([sel, np.repeat(sel[:1], pad)]) if pad else sel
x0s = jnp.asarray(xT[sel_p], jdt)
x0s = x0s.at[:, model.nq:].set(0.0)   # at rest

# (b) kinematic feasibility of each guess path
for tag, kw in [("nearest", dict()), ("rr0", dict(anchor=0)),
                ("rr1", dict(anchor=1)), ("rr2", dict(anchor=2)),
                ("via0", dict(anchor=0, via=True)),
                ("via1", dict(anchor=1, via=True)),
                ("via2", dict(anchor=2, via=True))]:
    xg, ug = rp._ik_guess(x0s, **kw)
    colls = np.asarray(jax.vmap(lambda xs: jnp.all(jax.vmap(model.check_collision)(xs)))(xg))
    bounds = np.asarray(jax.vmap(lambda xs: jnp.all(jax.vmap(model.check_state_bounds)(xs)))(xg))
    eeT = np.asarray(jax.vmap(model.ee_pos)(xg[:, -1]))
    errT = np.linalg.norm(eeT - np.asarray(model.ee_ref)[None], axis=1)
    print(f"kin {tag}: collision-free {colls[:sel.size].sum()}/{sel.size}, "
          f"in-bounds {bounds[:sel.size].sum()}/{sel.size}, "
          f"errT med {np.median(errT[:sel.size])*1000:.1f} mm")

# (a) escape solves per guess (bare spec)
for tag, kw in [("hold", None), ("nearest", dict()),
                ("via0", dict(anchor=0, via=True)),
                ("via1", dict(anchor=1, via=True)),
                ("via2", dict(anchor=2, via=True))]:
    if kw is None:
        xg, ug = rp._hold_guess(x0s)
    else:
        xg, ug = rp._ik_guess(x0s, **kw)
    xs, us, status, errs, viol = rp._solve_esc(xg, ug, x0s)
    s = np.asarray(status)[:sel.size]; e = np.asarray(errs)[:sel.size]
    print(f"esc {tag}: status0 {int((s==0).sum())}/{sel.size}, "
          f"err<5mm {(e<5e-3).sum()}, err med {np.median(e)*1000:.1f} mm, "
          f"errs {np.round(e*1000,1)}")
