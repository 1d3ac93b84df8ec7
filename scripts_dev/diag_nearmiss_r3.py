"""Round-3 near-miss diagnosis: from the flagship's 1-20 mm final
states, (1) does the finisher certify a solve, and (2) does simply
CONTINUING the closed loop (200 more steps, lm_drop on) converge them —
i.e. is the residual a time-budget artifact or a genuine trap?

Usage: python scripts_dev/diag_nearmiss_r3.py [--cpu]
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
                     "generated", "xla_cache_diag")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
import jax.numpy as jnp

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.replan import StallReplanner
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
from safe_mpc_tpu.controllers.base import SafeBackupController

cfg = load_config().with_(N=45, use_net=True)
if not force_cpu:
    cfg = cfg.with_(dtype="float32")
model = ManipulatorModel(cfg)
jdt = jnp.float32

d = pickle.load(open('data_noise/scratch_flagship/z1_receding_use_netTrue_45hor_10sm_noise_0.0_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl','rb'))
xT = d['x'][:, -1]
ee = np.asarray(jax.vmap(model.ee_pos)(jnp.asarray(xT, jdt)))
err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
near = np.flatnonzero((err > cfg.tol_conv) & (err < 0.02))
print(f"near-misses: {near.tolist()} errs {np.round(err[near]*1000,2)} mm")

B = 16
sel = near[:B]
pad = B - sel.size
sel_p = np.concatenate([sel, np.repeat(sel[:1], pad)]) if pad else sel
x0s = jnp.asarray(xT[sel_p], jdt)

ctrl = get_controller("receding", model, N=45, lm_drop_tol=5e-3, rti_iters=3)
replan_ctrl = get_guess_controller("receding", model, N=60, rti_iters=10)
rp = StallReplanner(replan_ctrl, ctrl, chunk=B)

# (1) finisher certification from these states
xs, us, status, errs, viol = rp._solve_fin(*rp._hold_guess(x0s, N=45), x0s)
s = np.asarray(status)[:sel.size]; e = np.asarray(errs)[:sel.size]
print(f"finisher: status0 {(s==0).sum()}/{sel.size}, "
      f"certified(err<0.5mm) {((s==0)&(e<5e-4)).sum()}, errs "
      f"{np.round(e*1000,2)} mm")

# (2) continue the closed loop 200 steps (with splice of certified fins)
backup = SafeBackupController(model, N=cfg.back_hor)
sim = ClosedLoopSim(ctrl, backup=backup, log_trajectories=False)
rp2 = StallReplanner(get_guess_controller("receding", model, N=240, rti_iters=60, lm=1e-3), ctrl)
res = sim.run(x0s, n_steps=200, verbose=True, replanner=rp2)
xF = np.asarray(res.final_state.x)[:sel.size]
eeF = np.asarray(jax.vmap(model.ee_pos)(jnp.asarray(xF, jdt)))
errF = np.linalg.norm(eeF - np.asarray(model.ee_ref)[None], axis=1)
print(f"after +200 steps: conv {(errF<cfg.tol_conv).sum()}/{sel.size}, errs {np.round(errF*1000,2)} mm")
