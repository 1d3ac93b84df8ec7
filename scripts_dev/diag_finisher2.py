"""Debug the finisher gate through maybe_replan (mirrors the test)."""
import numpy as np
import jax.numpy as jnp

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, \
    get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim, MODE_MPC
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

sim = ClosedLoopSim(ctrl, backup=None)
x0s = jnp.asarray(np.tile(x_nm[None], (B, 1)))
st = sim.initial_state(x0s)

st1 = rp.maybe_replan(st, verbose=True)
print("after 1st: prev_err =", rp.prev_err, "n_fin =", rp.n_finishes)
print("mode =", np.asarray(st1.mode), "MODE_MPC =", MODE_MPC)
st2 = rp.maybe_replan(st1, verbose=True)
print("after 2nd: n_fin =", rp.n_finishes, "n_replans =", rp.n_replans,
      "n_brakes =", rp.n_brakes)

print("---- direct _finish_and_splice ----")
import jax
x0s2 = jnp.asarray(np.asarray(st1.x))
print("st1.x dtype", x0s2.dtype)
xs, us, status, errs, viol = rp._solve_fin(*rp._hold_guess(x0s2, N=20), x0s2)
print("status", np.asarray(status), "errs", np.asarray(errs))
st3, acc = rp._finish_and_splice(st1, np.array([0, 1]), verbose=True)
print("accepted:", acc, "n_fin:", rp.n_finishes)
