"""Deep-wedge escape: long-horizon SQP seeded with an IK-interpolation
guess (joint-space path from the stalled q to a multistart IK solution
of the target). Tests whether the replan mechanism can recover problems
where the cold-started long-horizon OCP cannot (diag_escape.py: probs
0 and 6 stuck at 5.34cm even at N=200).
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
    from safe_mpc_tpu.tasks.ik import solve_ik_multistart

    pkl = ("data_noise/z1_receding_use_netTrue_25hor_10sm_noise_0.0_"
           "control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl")
    with open(pkl, "rb") as f:
        d = pickle.load(f)
    xs = np.asarray(d["x"])[:, -1]

    cfg = load_config().with_(use_net=False)
    model = ManipulatorModel(cfg)
    nq = model.nq
    N = int(os.environ.get("ESC_N", "200"))
    ctrl = MPCController(model, N=N, lm=1e-3)

    for i in (0, 6, 1, 2):
        x0 = jnp.asarray(xs[i], jnp.float64)
        best = None
        for s in range(3):
            x_ik, ok = solve_ik_multistart(
                model, jnp.asarray(model.ee_ref), n_starts=16,
                key=jax.random.PRNGKey(100 + 7 * s + i))
            # joint-space interpolation guess: q(t) from q0 to q_ik with a
            # smooth (cosine) profile, v from finite differences, u = dv/dt
            t = 0.5 * (1 - jnp.cos(jnp.linspace(0.0, jnp.pi, N + 1)))
            qg = x0[:nq][None] + t[:, None] * (x_ik[:nq] - x0[:nq])[None]
            vg = jnp.gradient(qg, cfg.dt, axis=0)
            vg = vg.at[0].set(x0[nq:])
            xg = jnp.concatenate([qg, vg], axis=1)
            ug = (vg[1:] - vg[:-1]) / cfg.dt
            res = sqp_solve(ctrl.spec, xg, ug, x0, ctrl.schedule(
                ctrl.initial_state(x0)), max_iters=200, qp_iters=40,
                tol=1e-10)
            eeN = np.asarray(model.ee_pos(res.xs[N]))
            e = float(np.linalg.norm(eeN - np.asarray(model.ee_ref)))
            print(f"prob={i} seed={s}: status={int(res.status)} "
                  f"terminal_err={e:.4f}", flush=True)
            if best is None or e < best:
                best = e
        print(f"prob={i}: best={best:.4f}", flush=True)


if __name__ == "__main__":
    main()
