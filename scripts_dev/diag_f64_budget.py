"""How small can the f64 escape job be? Success + wall time vs (N, iters)
on the round-3 wedge-bound initial states."""
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
# wedge-bound problems from flagship round 2 (parked set + stall set)
sel = np.array([0,1,2,3,4,5,6,7,8,9,10,12,13,14,15,16])
x0s = jnp.asarray(xg0[sel, 0], jnp.float32)
B = sel.size

ctrl = get_controller("receding", model, N=45)

for N, iters in [(160, 60), (120, 60), (240, 100)]:
    replan_ctrl = get_guess_controller("receding", model, N=N, rti_iters=10)
    rp = StallReplanner(replan_ctrl, ctrl, chunk=B)
    rp.use_f64 = False
    nq = model.nq
    far = np.argmax(np.linalg.norm(
        np.asarray(x0s)[:, None, :nq] - rp.q_iks[None, :, :nq], axis=2), axis=1)
    xg1, ug1 = rp._ik_guess(x0s, anchor=far)
    xg2, ug2 = rp._ik_guess(x0s, anchor=far, via=True)
    xg = np.concatenate([np.asarray(xg1), np.asarray(xg2)])
    ug = np.concatenate([np.asarray(ug1), np.asarray(ug2)])
    job = EscapeF64Job(np.tile(sel, 2), np.tile(np.asarray(x0s), (2, 1)),
                       xg, ug, N=N, sqp_iters=iters, qp_iters=30)
    t0 = time.time(); out = None
    while out is None and time.time() - t0 < 3000:
        time.sleep(5); out = job.poll()
    if out is None:
        job.cancel(); print(f"N={N} iters={iters}: TIMEOUT"); continue
    _, _, xs, us, status, err_T, viol = out
    s = np.asarray(status); e = np.asarray(err_T)
    # best per problem
    best = np.full(B, np.inf)
    for i in range(2 * B):
        p = i % B
        if s[i] == 0:
            best[p] = min(best[p], e[i])
    print(f"N={N} iters={iters}: {time.time()-t0:.0f}s, "
          f"best<5mm {(best<5e-3).sum()}/{B}, best<25mm {(best<2.5e-2).sum()}/{B}, "
          f"med {np.median(best[np.isfinite(best)])*1000:.1f}mm")
