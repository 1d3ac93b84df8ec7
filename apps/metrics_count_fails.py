"""Noise-sweep scoring variant (reference metrics_count_fails.py):
scores across noise levels with collisions scored as cost -100
(metrics_count_fails.py:70-75), producing per-noise scores pickles."""

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

    import jax
    import jax.numpy as jnp

    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import mpc_path

    cfg = config_from_args(args, rti=True)
    model = ManipulatorModel(cfg)
    jdt = jnp.float64 if dtype == "float64" else jnp.float32
    Q, R = cfg.Q_weight, cfg.R_weight
    ee_ref = np.asarray(cfg.ee_ref)
    batched_ee = jax.jit(jax.vmap(model.ee_pos))

    def traj_cost(xs, us):
        if not np.all(np.isfinite(xs)):
            return -100.0          # collision sentinel (metrics_count_fails)
        ee = np.asarray(batched_ee(jnp.asarray(xs, jdt)))
        err = ee - ee_ref[None]
        return float(Q * np.sum(err * err) + R * np.sum(us * us))

    res_out = {}
    for c in CONT_NAMES:
        path = mpc_path(cfg, c, args["horizon"])
        if not os.path.isfile(path):
            continue
        with open(path, "rb") as f:
            data = pickle.load(f)
        xs, us = np.asarray(data["x"]), np.asarray(data["u"])
        costs = [traj_cost(xs[i], us[i]) for i in range(xs.shape[0])]
        res_out[c] = {
            "fails": len(data["collisions_idx"]),
            "costs": costs,
            "completed_idx": sorted(data["conv_idx"] + data["unconv_idx"]),
        }
        print(f"{c}: fails={res_out[c]['fails']} "
              f"mean_cost={np.mean([x for x in costs if x >= 0]):.2f}")
    out = os.path.join(
        cfg.data_dir,
        f"{cfg.urdf_name}_{args['horizon']}hor_noise{cfg.noise}_"
        f"cn{cfg.control_noise}_scores.pkl")
    with open(out, "wb") as f:
        pickle.dump(res_out, f)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
