"""Validate the fast f64 recipe: (N=240, sqp 60, qp 25), direct-only
branch-swap guess, 3-4 concurrent jobs of 8 problems — success + wall."""
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

cfg = load_config().with_(N=45, use_net=True, dtype="float32")
model = ManipulatorModel(cfg)
xg0, ug0 = pickle.load(open('data_noise/z1_receding_45hor_10sm_use_netTrue__q_collision_margins_0.0_0.0_guess.pkl','rb')).values()
sel_all = np.array([3,4,5,6,7,9,23,27,30,32,34,35,40,41,47,52,60,61,64,70,82,83,85,90])  # 24 of the 26 parked
ctrl = get_controller("receding", model, N=45)
replan_ctrl = get_guess_controller("receding", model, N=240, rti_iters=10)
rp = StallReplanner(replan_ctrl, ctrl, chunk=8)
rp.use_f64 = False
nq = model.nq

jobs = []
t0 = time.time()
for a in range(0, sel_all.size, 8):
    sel = sel_all[a:a+8]
    x0s = jnp.asarray(xg0[sel, 0], jnp.float32)
    far = np.argmax(np.linalg.norm(
        np.asarray(x0s)[:, None, :nq] - rp.q_iks[None, :, :nq], axis=2), axis=1)
    xg, ug = rp._ik_guess(x0s, anchor=far)
    jobs.append((sel, EscapeF64Job(sel, np.asarray(x0s), np.asarray(xg),
                                   np.asarray(ug), N=240, sqp_iters=60,
                                   qp_iters=25)))
print(f"{len(jobs)} concurrent jobs of 8 launched")
done = {}
while len(done) < len(jobs) and time.time() - t0 < 2400:
    time.sleep(5)
    for k, (sel, job) in enumerate(jobs):
        if k in done: continue
        out = job.poll()
        if out is not None:
            done[k] = out
            _,_,_,_, s, e, _ = out
            print(f"job {k} ({time.time()-t0:.0f}s): "
                  f"<5mm {((s==0)&(e<5e-3)).sum()}/8, "
                  f"<25mm {((s==0)&(e<2.5e-2)).sum()}/8, "
                  f"errs {np.round(e*1000,1)}")
for k,(sel,job) in enumerate(jobs):
    if k not in done: job.cancel(); print(f"job {k}: TIMED OUT")
