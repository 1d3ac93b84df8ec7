"""Stage artifacts: the reference's pickle protocol (SURVEY.md §2.4).

Filename schema and dict keys match the reference exactly so downstream
tooling ports unchanged:

* guess:  ``{model}_{cont}_{hor}hor_{alpha}sm_use_net{flag}_{traj}_q_collision_margins_{qm}_{cm}_guess.pkl``
  -> {'xg': (tests, N+1, nx), 'ug': (tests, N, nu)}   (guess_acados.py:235-244)
* mpc:    ``..._mpc.pkl`` -> {'x','u','r','conv_idx','collisions_idx',
  'unconv_idx','viable_idx','x_viable'}               (mpc.py:307-315)
* scores: ``..._scores.pkl`` -> per-controller {'score','fails',...}
  (metrics.py:180-182)
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..config import SafeMpcConfig


def _traj_tag(cfg: SafeMpcConfig) -> str:
    if not cfg.track_traj:
        return ""
    # per-trajectory tag: shape8 and circle artifacts must not collide
    return f"traj_{cfg.traj_name}" if cfg.traj_name else "traj_track"


def guess_path(cfg: SafeMpcConfig, cont_name: str, horizon: int | None = None) -> str:
    horizon = int(horizon if horizon is not None else cfg.N)
    return os.path.join(
        cfg.data_dir,
        f"{cfg.urdf_name}_{cont_name}_{horizon}hor_{int(cfg.alpha)}sm_"
        f"use_net{cfg.use_net}_{_traj_tag(cfg)}_q_collision_margins_"
        f"{cfg.joint_bounds_margin}_{cfg.collision_margin}_guess.pkl")


def mpc_path(cfg: SafeMpcConfig, cont_name: str, horizon: int | None = None) -> str:
    horizon = int(horizon if horizon is not None else cfg.N)
    return os.path.join(
        cfg.data_dir,
        f"{cfg.urdf_name}_{cont_name}_use_net{cfg.use_net}_{horizon}hor_"
        f"{int(cfg.alpha)}sm_{_traj_tag(cfg)}noise_{cfg.noise}_control_noise"
        f"{cfg.control_noise}_q_collision_margins_{cfg.joint_bounds_margin}_"
        f"{cfg.collision_margin}_mpc.pkl")


def planlib_path(cfg: SafeMpcConfig, cont_name: str,
                 horizon: int | None = None) -> str:
    """Offline f64 plan library (apps/plan_library.py): per problem, the
    best long-horizon f64 escape plan from the full anchor-guess menu,
    solved at guess time — the offline analogue of the reference's
    initializer stage (guess_acados.py:98-165) for the replan machinery."""
    return guess_path(cfg, cont_name, horizon).replace(
        "_guess.pkl", "_planlib.npz")


def scores_path(cfg: SafeMpcConfig, horizon: int | None = None) -> str:
    """Scores pickle (reference metrics.py:180-182). The reference keys
    only by alpha and lets horizon sweeps clobber; we tag the horizon so
    per-horizon cross-controller comparisons coexist (pass horizon=None
    for the legacy reference-compatible name)."""
    tag = "" if horizon is None else f"{int(horizon)}hor_"
    return os.path.join(
        cfg.data_dir,
        f"{cfg.urdf_name}_{tag}{int(cfg.alpha)}sm_scores.pkl")


def save_guess(path: str, xg, ug) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"xg": np.asarray(xg), "ug": np.asarray(ug)}, f)


def load_guess(path: str):
    with open(path, "rb") as f:
        data = pickle.load(f)
    return np.asarray(data["xg"]), np.asarray(data["ug"])


def save_mpc_result(path: str, result) -> None:
    """Reference mpc-pickle protocol (mpc.py:307-315) — same keys.

    Counters are NOT part of the pickle (matching the reference);
    they only appear in the run summary print. Known deviation there:
    counter 2 (obstacle) is computed live here while the reference's
    check block is commented out and always prints 0 (mpc.py:216-230)
    — expect a nonzero column where the reference shows zero."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({
            "x": np.asarray(result.xs),
            "u": np.asarray(result.us),
            "r": np.asarray(result.rs),
            "conv_idx": result.conv_idx,
            "collisions_idx": result.collisions_idx,
            "unconv_idx": result.unconv_idx,
            "viable_idx": result.viable_idx,
            "x_viable": np.asarray(result.x_viable),
        }, f)


def load_mpc_result(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_scores(path: str, scores: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(scores, f)


def save_noise_params(path: str, params) -> None:
    """Perturbed-inertial ensembles as npz (replaces *_randomized*.urdf)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, mass=np.asarray(params.mass), com=np.asarray(params.com),
             inertia=np.asarray(params.inertia))


def load_noise_params(path: str):
    from ..models.robot import InertialParams
    import jax.numpy as jnp
    z = np.load(path)
    return InertialParams(mass=jnp.asarray(z["mass"]),
                          com=jnp.asarray(z["com"]),
                          inertia=jnp.asarray(z["inertia"]))
