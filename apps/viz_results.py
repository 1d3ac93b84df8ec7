"""Replay logged closed-loop trajectories (reference viz_results.py):
renders scene + robot trajectory snapshots for selected problems from an
``_mpc.pkl`` to PNG files."""

from __future__ import annotations

import os

import numpy as np

from _common import setup_runtime
from safe_mpc_tpu.config import config_from_args, parse_args


def main(argv=None):
    args = parse_args(argv)
    setup_runtime(force_cpu=True)   # rendering is host-side

    import jax.numpy as jnp

    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import load_mpc_result, mpc_path
    from safe_mpc_tpu.utils.visualizer import RobotVisualizer

    cfg = config_from_args(args, rti=True)
    model = ManipulatorModel(cfg)
    data = load_mpc_result(mpc_path(cfg, args["controller"], args["horizon"]))
    xs = np.asarray(data["x"])
    outdir = os.path.join(cfg.data_dir, "viz")
    os.makedirs(outdir, exist_ok=True)
    for i in range(min(4, xs.shape[0])):
        traj = xs[i][np.all(np.isfinite(xs[i]), axis=1)]
        viz = RobotVisualizer(model)
        viz.draw_scene()
        viz.draw_trajectory(jnp.asarray(traj))
        tag = ("conv" if i in data["conv_idx"] else
               "coll" if i in data["collisions_idx"] else
               "viab" if i in data["viable_idx"] else "unconv")
        viz.save(os.path.join(outdir,
                              f"{args['controller']}_{i}_{tag}.png"),
                 title=f"{args['controller']} #{i} [{tag}]")


if __name__ == "__main__":
    main()
