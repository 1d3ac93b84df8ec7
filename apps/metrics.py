"""Controller scoring (reference scripts/metrics.py).

For each initial state, computes the best-known cost by solving a
full-episode-horizon OCP warm-started from the best controller's logged
trajectory (metrics.py:56-135), with an incremental memo cache keyed by
x0 within 1e-3 (metrics.py:9-13). Scores = trajectory cost / best cost;
reports mean % surplus + failure counts per controller into the scores
pickle (metrics.py:164-182).

Costs use the reference's explicit convention: plain sums of e'Qe + u'Ru
(metrics.py:19-28)."""

from __future__ import annotations

import os
import pickle

import numpy as np

from _common import setup_runtime
from safe_mpc_tpu.config import config_from_args, parse_args

CONT_NAMES = ["naive", "zerovel", "st", "htwa", "receding", "parallel"]


def main(argv=None):
    args = parse_args(argv)
    backend, dtype = setup_runtime(force_cpu=args.get("cpu", False))
    print(f"backend={backend} dtype={dtype}")

    import jax
    import jax.numpy as jnp

    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import mpc_path, scores_path
    from safe_mpc_tpu.ops.transcribe import OcpSpec

    cfg = config_from_args(args, rti=True)
    if backend != "cpu":
        cfg = cfg.with_(dtype="float32")
    model = ManipulatorModel(cfg)
    hor = args["horizon"]

    jdt = jnp.float64 if dtype == "float64" else jnp.float32
    Q, R = cfg.Q_weight, cfg.R_weight
    ee_ref = np.asarray(cfg.ee_ref)

    batched_ee = jax.jit(jax.vmap(model.ee_pos))

    def traj_cost(xs, us):
        if not np.all(np.isfinite(xs)):
            return np.nan
        ee = np.asarray(batched_ee(jnp.asarray(xs, jdt)))
        err = ee - ee_ref[None]
        return float(Q * np.sum(err * err) + R * np.sum(us * us))

    # load per-controller mpc results
    X, U, failed = {}, {}, {}
    found = []
    for c in CONT_NAMES:
        path = mpc_path(cfg, c, hor)
        if not os.path.isfile(path):
            print(f"  (skipping {c}: no {path})")
            continue
        with open(path, "rb") as f:
            data = pickle.load(f)
        X[c], U[c] = np.asarray(data["x"]), np.asarray(data["u"])
        failed[c] = set(data["collisions_idx"])
        found.append(c)
    if not found:
        print("No mpc pickles found — run apps/mpc.py first.")
        return

    # optimal-cost memo cache (metrics.py:44-53)
    cache_file = os.path.join(cfg.data_dir, "costs_state.pkl")
    if os.path.isfile(cache_file):
        with open(cache_file, "rb") as f:
            cache = pickle.load(f)
    else:
        cache = {"states": [], "costs": []}

    # long-horizon optimizer (N = n_steps, full SQP; replaces the IPOPT
    # solve at metrics.py:56-69). Matches the reference's full-episode
    # horizon by default (metrics.py:56-69); override via env for quick
    # runs. Cached optima record the horizon they were solved at, so
    # raising N_opt invalidates shorter-horizon entries (legacy caches
    # without the field are treated as N=400, the old default).
    N_opt = min(cfg.n_steps,
                int(os.environ.get("METRICS_OPT_HORIZON", str(cfg.n_steps))))
    cache.setdefault("n_opt", [400] * len(cache["states"]))

    def cached_cost(x0):
        for s, cc, n in zip(cache["states"], cache["costs"], cache["n_opt"]):
            if np.all(np.abs(np.asarray(s) - x0) < 1e-3) and n >= N_opt:
                return cc
        return None
    spec = OcpSpec(model, N=N_opt, lm=0.01, cost_scaling="none")
    from safe_mpc_tpu.ops.sqp import sqp_solve
    sched = spec.default_schedule(jdt)

    @jax.jit
    def opt_solve(xg, ug, x0):
        return sqp_solve(spec, xg, ug, x0, sched, max_iters=60, qp_iters=25)

    n_tests = min(cfg.test_num, X[found[0]].shape[0])
    tot_scores = {c: [] for c in found}
    for i in range(n_tests):
        costs = np.array([traj_cost(X[c][i], U[c][i]) for c in found])
        if np.all(np.isnan(costs)):
            print(f"problem {i}: all controllers failed")
            continue
        j_min = int(np.nanargmin(costs))
        c_min = found[j_min]
        x0 = X[c_min][i][0]
        min_cost = cached_cost(x0)
        if min_cost is None:
            xg = jnp.asarray(X[c_min][i][: N_opt + 1], jdt)
            ug = jnp.asarray(U[c_min][i][: N_opt], jdt)
            res = opt_solve(xg, ug, jnp.asarray(x0, jdt))
            cost_opt = traj_cost(np.asarray(res.xs), np.asarray(res.us))
            min_cost = min(cost_opt, np.nanmin(costs)) \
                if int(res.status) == 0 else float(np.nanmin(costs))
            cache["states"].append(x0)
            cache["costs"].append(min_cost)
            cache["n_opt"].append(N_opt)
            if i % 10 == 0:
                with open(cache_file, "wb") as f:
                    pickle.dump(cache, f)
        elif np.nanmin(costs) < min_cost:
            # "best-KNOWN cost" includes what the controllers achieve
            # NOW (reference metrics.py:150-153 takes the min over the
            # optimizer result and all controller costs): a cached
            # optimum solved from an older, worse warm start can be
            # beaten by a newer closed-loop trajectory — refresh it so
            # scores stay >= 1
            min_cost = float(np.nanmin(costs))
            for k, s in enumerate(cache["states"]):
                if np.all(np.abs(np.asarray(s) - x0) < 1e-3):
                    cache["costs"][k] = min_cost
                    break
        if all(i not in failed[c] for c in found):
            for j, c in enumerate(found):
                tot_scores[c].append(costs[j] / min_cost)

    with open(cache_file, "wb") as f:
        pickle.dump(cache, f)
    res_out = {}
    print("\n### Final scores: ###\n")
    for c in found:
        mean_score = np.mean(tot_scores[c]) if tot_scores[c] else np.nan
        perc = round((mean_score - 1) * 100, 2)
        print(f"{c}: scores={len(tot_scores[c])} mean={mean_score:.4f} "
              f"surplus={perc}% fails={len(failed[c])}")
        res_out[c] = {"score": perc, "fails": len(failed[c]),
                      "costs": tot_scores[c]}

    with open(scores_path(cfg, hor), "wb") as f:
        pickle.dump(res_out, f)
    with open(cache_file, "wb") as f:
        pickle.dump(cache, f)
    print(f"saved {scores_path(cfg, hor)}")


if __name__ == "__main__":
    main()
