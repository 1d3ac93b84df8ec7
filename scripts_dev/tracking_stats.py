"""Outcome statistics for the tracking noise-ensemble artifacts
(VERDICT r4 task 8; reference guess_acados.py:167-227 tracking branch).

For each tracking mpc pickle: per-test EE tracking error vs the moving
reference over the episode; reports mean / p50 / p99 RMS and max error,
plus the safety outcome (collisions / safe-set violations come from the
run log). Writes docs/tracking_ensemble.md.

Usage: python scripts_dev/tracking_stats.py
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from safe_mpc_tpu.config import load_config  # noqa: E402
from safe_mpc_tpu.models.manipulator import ManipulatorModel  # noqa: E402
from safe_mpc_tpu.tasks.trajectories import get_trajectory  # noqa: E402

RUNS = [
    ("shape8", "data_noise/z1_receding_use_netTrue_25hor_10sm_traj_shape8"
               "noise_2.5_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl"),
    ("circle", "data_noise/z1_receding_use_netTrue_25hor_10sm_traj_circle"
               "noise_2.5_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl"),
]


def main():
    cfg = load_config().with_(track_traj=True, n_steps=2000)
    model = ManipulatorModel(cfg)
    ee_fn = jax.jit(jax.vmap(jax.vmap(model.ee_pos)))
    lines = ["# Tracking noise-ensemble outcomes (receding, N=25, "
             "2.5% model noise, 100 tests x 2000 steps)\n"]
    for name, path in RUNS:
        if not os.path.isfile(path):
            print(f"skip {name}: no {path}")
            continue
        with open(path, "rb") as f:
            data = pickle.load(f)
        xs = np.asarray(data["x"])           # (B, T+1, nx)
        B, T1 = xs.shape[:2]
        traj = np.asarray(get_trajectory(cfg, name, N=25))[:, :T1]
        ee = np.asarray(ee_fn(jnp.asarray(xs)))
        err = np.linalg.norm(ee - traj.T[None], axis=2)       # (B, T+1)
        rms = np.sqrt(np.mean(err ** 2, axis=1))
        lines.append(f"\n## {name}\n")
        lines.append(f"- collisions: {len(data['collisions_idx'])}, "
                     f"aborts: {len(data['viable_idx'])}")
        lines.append(f"- RMS tracking error [mm]: mean "
                     f"{rms.mean() * 1e3:.1f}, p50 "
                     f"{np.percentile(rms, 50) * 1e3:.1f}, p99 "
                     f"{np.percentile(rms, 99) * 1e3:.1f}")
        lines.append(f"- max instantaneous error [mm]: mean "
                     f"{err.max(axis=1).mean() * 1e3:.1f}, worst "
                     f"{err.max() * 1e3:.1f}")
        print("\n".join(lines[-4:]))
    out = "docs/tracking_ensemble.md"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
