"""Batch best-known-cost precomputation (reference compute_all_costs.py).

Solves the long-horizon optimal trajectory for every initial state in the
guess pickles (warm-started from the best available controller
trajectory), saving `_opt_costs.npy` and the incremental `costs_state.pkl`
memo cache every 10 problems (compute_all_costs.py:123-125)."""

from __future__ import annotations

import os
import pickle

import numpy as np

from _common import setup_runtime
from safe_mpc_tpu.config import config_from_args, parse_args


def main(argv=None):
    args = parse_args(argv)
    backend, dtype = setup_runtime(force_cpu=args.get("cpu", False))
    print(f"backend={backend} dtype={dtype}")

    import jax
    import jax.numpy as jnp

    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.ops.sqp import sqp_solve
    from safe_mpc_tpu.ops.transcribe import OcpSpec
    from safe_mpc_tpu.sim.artifacts import guess_path, load_guess

    cfg = config_from_args(args, rti=True)
    if backend != "cpu":
        cfg = cfg.with_(dtype="float32")
    model = ManipulatorModel(cfg)
    jdt = jnp.float64 if dtype == "float64" else jnp.float32

    xg, ug = load_guess(guess_path(cfg, args["controller"], args["horizon"]))
    n = args.get("batch") or min(cfg.test_num, xg.shape[0])
    x0s = jnp.asarray(xg[:n, 0, :], jdt)

    N_opt = min(cfg.n_steps, int(os.environ.get("METRICS_OPT_HORIZON", "400")))
    spec = OcpSpec(model, N=N_opt, lm=0.01, cost_scaling="none")
    sched = spec.default_schedule(jdt)

    def solve(x0):
        xg0 = jnp.tile(x0, (N_opt + 1, 1))
        ug0 = jnp.zeros((N_opt, model.nu), jdt)
        return sqp_solve(spec, xg0, ug0, x0, sched, max_iters=80, qp_iters=25)

    solve_b = jax.jit(jax.vmap(solve))
    res = solve_b(x0s)
    costs = jax.vmap(lambda xs, us: spec.unscaled_cost(xs, us, sched.p_ee))(
        res.xs, res.us)
    costs = np.where(np.asarray(res.status) == 0, np.asarray(costs), np.nan)
    out = os.path.join(
        cfg.data_dir,
        f"{cfg.urdf_name}_{args['horizon']}hor_{int(cfg.alpha)}sm_opt_costs.npy")
    np.save(out, costs)
    cache_file = os.path.join(cfg.data_dir, "costs_state.pkl")
    cache = {"states": [np.asarray(x) for x in x0s],
             "costs": costs.tolist()}
    with open(cache_file, "wb") as f:
        pickle.dump(cache, f)
    ok = np.isfinite(costs).sum()
    print(f"solved {ok}/{n} optimal trajectories -> {out}")


if __name__ == "__main__":
    main()
