"""Diagnose the flagship limit cycle: sweep (levenberg_marquardt, rti_iters)
on a subset of the flagship problems and report final EE error / velocity.

Usage: python scripts_dev/diag_convergence.py [--cpu]
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
    print(f"backend={backend} dtype={dtype}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.base import SafeBackupController
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import guess_path, load_guess
    from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim

    B = int(os.environ.get("DIAG_B", "16"))
    n_steps = int(os.environ.get("DIAG_STEPS", "800"))
    use_net = os.environ.get("DIAG_NET", "1") == "1"
    HOR = int(os.environ.get("DIAG_HOR", "45"))

    base = load_config().with_(N=HOR, use_net=use_net)

    # (label, controller, use_net, lm, rti_iters, cost_scaling)
    configs = [
        (f"rec-net N={HOR} lm=1e-3 it=1 long", "receding", True, 1e-3, 1, "dt"),
        (f"rec-net N={HOR} lm=1e-3 it=3", "receding", True, 1e-3, 3, "dt"),
        (f"naive   N={HOR} lm=1e-3 it=1", "naive", True, 1e-3, 1, "dt"),
        (f"rec-net N={HOR} lm=3e-4 it=1", "receding", True, 3e-4, 1, "dt"),
    ]
    for name, cont, unet, lm, iters, scaling in configs:
        n_run = n_steps * (2 if "long" in name else 1)
        cfg = base.with_(levenberg_marquardt=lm, use_net=unet)
        model = ManipulatorModel(cfg)
        ctrl = get_controller(cont, model, N=HOR, rti_iters=iters,
                              cost_scaling=scaling)
        gpath = guess_path(cfg.with_(use_net=True), cont, HOR)
        xg, ug = load_guess(gpath)
        xg, ug = xg[:B], ug[:B]
        x0s = jnp.asarray(xg[:, 0, :])
        backup = SafeBackupController(model, N=cfg.back_hor)
        sim = ClosedLoopSim(ctrl, backup=backup)
        t0 = time.time()
        res = sim.run(x0s, xg=jnp.asarray(xg), ug=jnp.asarray(ug),
                      n_steps=n_run)
        wall = time.time() - t0
        xf = np.asarray(res.final_state.x)
        ee = np.asarray(jax.vmap(model.ee_pos)(jnp.asarray(xf)))
        err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
        v = np.abs(xf[:, model.nq:]).max(axis=1)
        print(f"{name}: conv={len(res.conv_idx)}/{B} "
              f"coll={len(res.collisions_idx)} viab={len(res.viable_idx)} | "
              f"err med={np.median(err):.4f} max={err.max():.4f} "
              f"<1e-3:{(err < 1e-3).sum()} <1e-2:{(err < 1e-2).sum()} | "
              f"|v| med={np.median(v):.4f} | {wall:.0f}s", flush=True)
        print(f"  per-problem err: "
              f"{np.array2string(err, precision=3, max_line_width=200)}",
              flush=True)


if __name__ == "__main__":
    main()
