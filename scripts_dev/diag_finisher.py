"""Debug: why does the finisher solve not splice on the test near-miss?"""
import numpy as np
import jax
import jax.numpy as jnp

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, \
    get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
from safe_mpc_tpu.sim.replan import StallReplanner
from safe_mpc_tpu.tasks.ik import solve_ik_multistart

B, N = 2, 20
cfg = load_config().with_(N=N, use_net=False)
model = ManipulatorModel(cfg)
ctrl = get_controller("naive", model, N=N)
replan_ctrl = get_guess_controller("naive", model, N=30, rti_iters=10)
rp = StallReplanner(replan_ctrl, ctrl, chunk=B, sqp_iters=60,
                    ik_seeds=1, ik_starts=16)

q_tgt, ok = solve_ik_multistart(model, jnp.asarray(model.ee_ref))
x_nm = np.array(q_tgt, np.float64)
x_nm[:model.nq] += 0.008
x_nm[model.nq:] = 0.0
err0 = float(np.linalg.norm(
    np.asarray(model.ee_pos(jnp.asarray(x_nm))) - np.asarray(model.ee_ref)))
print("err0 =", err0, " tol_conv =", cfg.tol_conv,
      " finish_tol =", rp.finish_tol)

x0s = jnp.asarray(np.tile(x_nm[None], (B, 1)))
xs, us, status, errs, viol = rp._solve_fin(*rp._hold_guess(x0s, N=N), x0s)
print("finisher: status =", np.asarray(status), " err_T =", np.asarray(errs),
      " viol =", np.asarray(viol))
print("need status==0 and err_T <", 0.5 * cfg.tol_conv)

# compare: no Q boost, default lm
from safe_mpc_tpu.controllers.base import MPCController
from functools import partial
for tag, kw in [("lm=1e-3, Q=1x", dict(lm=1e-3)),
                ("lm=0, Q=10x", dict(lm=0.0, Q=10.0 * model.cfg.Q_weight)),
                ("lm=0, Q=1x", dict(lm=0.0))]:
    c2 = MPCController(model, N=N, **kw)
    solve = jax.jit(lambda xg, ug, x0s, c=c2: rp._solve_impl(c, xg, ug, x0s))
    xs, us, status, errs, viol = solve(*rp._hold_guess(x0s, N=N), x0s)
    print(f"{tag}: status = {np.asarray(status)} err_T = {np.asarray(errs)}"
          f" viol = {np.asarray(viol)}")
