"""f64 escape success matrix on the f32-resistant wedge states."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import pickle
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.replan import StallReplanner
from safe_mpc_tpu.sim.escape_f64 import EscapeF64Job

cfg = load_config().with_(N=45, use_net=True)
model = ManipulatorModel(cfg)
d = pickle.load(open('data_noise/scratch_flagship/z1_receding_use_netTrue_45hor_10sm_noise_0.0_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl','rb'))
xT = d['x'][:, -1]
ee = np.asarray(jax.vmap(model.ee_pos)(jnp.asarray(xT, jnp.float32)))
err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
vmax = np.abs(xT[:, model.nq:]).max(axis=1)
wedged = np.flatnonzero((err > 0.02) & (err < 0.12) & (vmax < 0.3))
B = len(wedged)
x0s = jnp.asarray(xT[wedged], jnp.float32).at[:, model.nq:].set(0.0)
print(f"{B} wedged: {wedged.tolist()}")

ctrl = get_controller("receding", model, N=45)
replan_ctrl = get_guess_controller("receding", model, N=240, rti_iters=60, lm=1e-3)
rp = StallReplanner(replan_ctrl, ctrl, chunk=B)

for tag, kw in [("nearest", dict()), ("via0", dict(anchor=0, via=True)),
                ("rr1", dict(anchor=1)), ("rr2", dict(anchor=2))]:
    xg, ug = rp._ik_guess(x0s, **kw)
    job = EscapeF64Job(np.arange(B), np.asarray(x0s), np.asarray(xg),
                       np.asarray(ug), N=240, sqp_iters=120, qp_iters=30)
    t0 = time.time()
    out = None
    while out is None and time.time() - t0 < 2400:
        time.sleep(5)
        out = job.poll()
    if out is None:
        job.cancel(); print(f"f64 {tag}: TIMED OUT"); continue
    sel, x0, xs, us, status, err_T, viol = out
    s = np.asarray(status); e = np.asarray(err_T)
    print(f"f64 {tag} ({time.time()-t0:.0f}s): status0 {(s==0).sum()}/{B}, "
          f"err<5mm {((s==0)&(e<5e-3)).sum()}, errs {np.round(e*1000,1)}")
