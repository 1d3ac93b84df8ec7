"""Can a longer-horizon OCP escape the ~5cm cage stall?

Loads stalled final states from the flagship pickle (err in [3, 10] cm),
solves full-SQP reach OCPs at N in {45, 100, 200} (f64 CPU, generous
budget), and reports the terminal EE error of each plan. If long
horizons escape, an event-triggered long-horizon replan is a viable
completion mechanism; if not, the wedge is a deep local minimum and
completion needs guidance (via-point reference).

Usage: python scripts_dev/diag_escape.py
"""
from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "apps"))

from _common import setup_runtime


def main():
    backend, dtype = setup_runtime(force_cpu=True)
    print(f"backend={backend} dtype={dtype}", flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.base import MPCController
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.ops.sqp import sqp_solve

    pkl = ("data_noise/z1_receding_use_netTrue_25hor_10sm_noise_0.0_"
           "control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl")
    with open(pkl, "rb") as f:
        d = pickle.load(f)
    xs = np.asarray(d["x"])[:, -1]              # (B, nx) final states

    cfg = load_config().with_(use_net=False)
    model = ManipulatorModel(cfg)
    ee = np.asarray(jax.vmap(model.ee_pos)(jnp.asarray(xs)))
    err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
    stalled = np.where((err > 0.03) & (err < 0.10))[0][:4]
    print(f"stalled problems: {stalled} err={np.round(err[stalled], 4)}",
          flush=True)

    for N in (45, 100, 200):
        ctrl = MPCController(model, N=N, lm=1e-3)
        for i in stalled:
            x0 = jnp.asarray(xs[i], jnp.float64)
            # brake to rest first in the guess (start velocities !=0)
            st = ctrl.guess_correction(ctrl.initial_state(x0))
            sched = ctrl.schedule(st)
            res = sqp_solve(ctrl.spec, st.xg, st.ug, x0, sched,
                            max_iters=200, qp_iters=40, tol=1e-10)
            eeN = np.asarray(model.ee_pos(res.xs[N]))
            e = float(np.linalg.norm(eeN - np.asarray(model.ee_ref)))
            print(f"N={N:4d} prob={i:3d}: status={int(res.status)} "
                  f"terminal_err={e:.4f}", flush=True)


if __name__ == "__main__":
    main()
