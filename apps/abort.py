"""Post-hoc abort verification (reference scripts/abort.py).

Loads an ``_mpc.pkl``, re-solves the SafeBackup braking OCP from every
recorded viable state (constant cold-start guess, abort.py:9-33), splices
the abort trajectory into the logged trajectories at the first-NaN index
(abort.py:53-64), re-verifies running + dynamics feasibility
(abort.py:65-74), and reports mean + 99%-quantile solve timings."""

from __future__ import annotations

import time

import numpy as np

from _common import setup_runtime
from safe_mpc_tpu.config import config_from_args, parse_args


def main(argv=None):
    args = parse_args(argv)
    backend, dtype = setup_runtime(force_cpu=args.get("cpu", False))
    print(f"backend={backend} dtype={dtype}")

    import jax
    import jax.numpy as jnp

    from safe_mpc_tpu.controllers.base import SafeBackupController
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import load_mpc_result, mpc_path

    cfg = config_from_args(args, rti=True)
    if backend != "cpu":
        cfg = cfg.with_(dtype="float32")
    model = ManipulatorModel(cfg)
    data = load_mpc_result(mpc_path(cfg, args["controller"], args["horizon"]))

    x_viable = np.asarray(data["x_viable"])
    x_viable = x_viable[np.all(np.isfinite(x_viable), axis=1)]
    if x_viable.shape[0] == 0:
        print("No viable states recorded — nothing to verify.")
        return

    backup = SafeBackupController(model, N=cfg.back_hor)
    solve = jax.jit(jax.vmap(lambda x: backup.solve_backup(x)))

    xv = jnp.asarray(x_viable, jnp.float64 if dtype == "float64"
                     else jnp.float32)
    t0 = time.time()
    res = jax.block_until_ready(solve(xv))
    t_first = time.time() - t0
    reps = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(solve(xv))
        reps.append((time.time() - t0) / xv.shape[0])

    ok = np.asarray(res.status) == 0
    print(f"Abort solves: {ok.sum()}/{len(ok)} succeeded")

    # re-verify feasibility of each abort trajectory (abort.py:65-74)
    feas = []
    for i in range(xv.shape[0]):
        xs, us = res.xs[i], res.us[i]
        taus = jax.vmap(model.tau)(xs[:-1], us)
        f = bool(jnp.all(jax.vmap(model.check_state_bounds)(xs))) \
            and bool(jnp.all(model.check_torque_bounds(taus))) \
            and bool(model.check_dynamics(xs, us)) \
            and bool(jnp.all(jax.vmap(model.check_collision)(xs))) \
            and bool(jnp.all(jnp.abs(xs[-1, model.nq:]) < 1e-4))
        feas.append(f)
    print(f"Feasible abort trajectories: {sum(feas)}/{len(feas)}")

    # splice the abort trajectories into the logs at first-NaN (abort.py:53-64)
    xs_log = np.asarray(data["x"])
    spliced = 0
    vi = list(data.get("viable_idx", []))
    for k, prob in enumerate(vi[: xv.shape[0]]):
        nan_rows = np.flatnonzero(~np.isfinite(xs_log[prob]).all(axis=1))
        if nan_rows.size:
            j0 = nan_rows[0]
            seg = np.asarray(res.xs[k])[: max(0, xs_log.shape[1] - j0)]
            xs_log[prob, j0: j0 + seg.shape[0]] = seg
            spliced += 1
    print(f"Spliced {spliced} abort trajectories into the logs")

    reps = np.asarray(reps)
    print(f"Backup solve time per state: mean {reps.mean():.3e}s, "
          f"99% {np.quantile(reps, 0.99):.3e}s (first call incl. compile: "
          f"{t_first:.1f}s)")


if __name__ == "__main__":
    main()
