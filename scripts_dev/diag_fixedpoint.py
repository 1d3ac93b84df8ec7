"""Fixed-point discrimination test: start the closed loop AT an IK
solution (ee == ref, v == 0) with a stationary guess. If the loop stays
put, the limit cycle is pure basin-entry; if it drifts away, the
controller/sim has a destabilizing bug.

Usage: python scripts_dev/diag_fixedpoint.py [--cpu]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "apps"))

from _common import setup_runtime


def main():
    backend, dtype = setup_runtime(force_cpu="--cpu" in sys.argv)
    print(f"backend={backend} dtype={dtype}", flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.base import SafeBackupController
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
    from safe_mpc_tpu.tasks.ik import solve_ik_multistart

    n_steps = int(os.environ.get("DIAG_STEPS", "400"))

    for name, cont, use_net in [("rec-net", "receding", True),
                                ("naive", "naive", True)]:
        cfg = load_config().with_(N=25, use_net=use_net)
        model = ManipulatorModel(cfg)
        ctrl = get_controller(cont, model, N=25, rti_iters=1)

        # IK solutions at the EE target from several seeds
        B = 8
        xs = []
        for s in range(B):
            x, ok = solve_ik_multistart(model, jnp.asarray(model.ee_ref),
                                        n_starts=16,
                                        key=jax.random.PRNGKey(s))
            xs.append(np.asarray(x))
        x0s = jnp.asarray(np.stack(xs))
        ee0 = np.asarray(jax.vmap(model.ee_pos)(x0s))
        err0 = np.linalg.norm(ee0 - np.asarray(model.ee_ref)[None], axis=1)
        print(f"{name}: initial EE err {err0}", flush=True)

        # stationary guess: x repeated along horizon, u = 0
        xg = jnp.repeat(x0s[:, None, :], 26, axis=1)
        ug = jnp.zeros((B, 25, model.nq), x0s.dtype)

        backup = SafeBackupController(model, N=cfg.back_hor)
        sim = ClosedLoopSim(ctrl, backup=backup)
        t0 = time.time()
        res = sim.run(x0s, xg=xg, ug=ug, n_steps=n_steps)
        wall = time.time() - t0
        xf = np.asarray(res.final_state.x)
        ee = np.asarray(jax.vmap(model.ee_pos)(jnp.asarray(xf)))
        err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
        v = np.abs(xf[:, model.nq:]).max(axis=1)
        print(f"{name}: conv={len(res.conv_idx)}/{B} "
              f"coll={len(res.collisions_idx)} viab={len(res.viable_idx)} | "
              f"final err={np.array2string(err, precision=4)} | "
              f"|v|max={np.array2string(v, precision=4)} | {wall:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
