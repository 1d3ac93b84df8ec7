"""Empirical robustness sweep — the reference's "crash test"
(test_schianto.py:41-105): tracking-style MPC over a velocity x horizon
grid, recording failure booleans per cell. All initial states per cell run
as one batched program; horizons bucket into separate compilations."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from _common import setup_runtime


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--system", type=str, default="z1")
    parser.add_argument("-c", "--controller", type=str, default="receding")
    parser.add_argument("--horizons", type=int, nargs="+", default=[15, 25, 35])
    parser.add_argument("--velocities", type=float, nargs="+",
                        default=[0.5, 1.0, 2.0, 3.0])
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--n_steps", type=int, default=200)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out_dir", type=str, default=None,
                        help="artifact dir override (scratch for debug)")
    args = parser.parse_args(argv)
    backend, dtype = setup_runtime(force_cpu=args.cpu)
    print(f"backend={backend} dtype={dtype}")

    import jax
    import jax.numpy as jnp

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.base import SafeBackupController
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
    from safe_mpc_tpu.tasks.sampling import sample_initial_states

    cfg = load_config().with_(urdf_name=args.system, use_net=False)
    if backend != "cpu":
        cfg = cfg.with_(dtype="float32")
    model = ManipulatorModel(cfg)
    jdt = jnp.float64 if dtype == "float64" else jnp.float32

    grid = {}
    x0s = sample_initial_states(model, args.batch).astype(jdt)
    key = jax.random.PRNGKey(0)
    for hor in args.horizons:
        ctrl = get_controller(args.controller, model, N=hor)
        backup = SafeBackupController(model, N=cfg.back_hor)
        sim = ClosedLoopSim(ctrl, backup=backup, log_trajectories=False)
        for vel in args.velocities:
            key, k = jax.random.split(key)
            dirs = jax.random.normal(k, (args.batch, model.nq), jdt)
            dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
            xv = x0s.at[:, model.nq:].set(vel * dirs)
            res = sim.run(xv, n_steps=args.n_steps)
            nfail = len(res.collisions_idx)
            grid[f"h{hor}_v{vel}"] = {
                "fails": nfail, "viable": len(res.viable_idx),
                "of": args.batch}
            print(f"h={hor} |v|={vel}: {nfail}/{args.batch} failed, "
                  f"{len(res.viable_idx)} aborted safely")
    out_dir = args.out_dir or cfg.data_dir
    out = os.path.join(out_dir,
                       f"{args.system}_{args.controller}_crash_test.json")
    os.makedirs(out_dir, exist_ok=True)
    with open(out, "w") as f:
        json.dump(grid, f, indent=1)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
