"""Typed configuration for safe_mpc_tpu.

Replaces the reference's ``Parameters`` class + argparse front-end
(reference parser.py:9-222) with a frozen dataclass loaded from the same
YAML schema (config.yaml in the repo root mirrors the reference's semantic
fields). Unlike the reference, importing this module never parses
``sys.argv`` and never mutates global state (the reference executes
``parse_args()`` at import time, utils.py:13-15 — a quirk SURVEY.md flags
as not to be reproduced).

Scene geometry (obstacles / capsules / collision pairs) is loaded into
plain-Python dataclasses here and compiled into static arrays at trace
time by the scene compiler in :mod:`safe_mpc_tpu.models.manipulator`.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field, replace
from typing import Any

import numpy as np
import yaml

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CONFIG = os.path.join(REPO_ROOT, "config.yaml")


# ----------------------------------------------------------------- scene ----

@dataclass(frozen=True)
class PlaneObstacle:
    """Axis-aligned plane band (e.g. the floor), reference config.yaml:84-96."""
    name: str
    perpendicular_axis: int          # 0=x, 1=y, 2=z
    bounds: tuple[float, float]      # [low, high] coordinate along that axis
    position: tuple[float, float, float] = (0.0, 0.0, 0.0)
    real_bound: int = 0              # which side is physical (0 lower, 1 upper)


@dataclass(frozen=True)
class SphereObstacle:
    name: str
    radius: float
    position: tuple[float, float, float]
    bounds: tuple[float, float] = (0.0, 1e6)


@dataclass(frozen=True)
class RobotCapsule:
    """Capsule rigidly attached to a robot link (config.yaml:151-177)."""
    name: str
    link_name: str
    link_axis: int
    radius: float
    length: float
    spatial_offset: tuple[float, float, float] = (0.0, 0.0, 0.0)
    rotation_offset: tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclass(frozen=True)
class FixedCapsule:
    name: str
    radius: float
    point_a: tuple[float, float, float]
    point_b: tuple[float, float, float]


@dataclass(frozen=True)
class RobotSphere:
    name: str
    link_name: str
    radius: float
    spatial_offset: tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclass(frozen=True)
class Scene:
    planes: tuple[PlaneObstacle, ...] = ()
    spheres: tuple[SphereObstacle, ...] = ()
    robot_capsules: tuple[RobotCapsule, ...] = ()
    fixed_capsules: tuple[FixedCapsule, ...] = ()
    robot_spheres: tuple[RobotSphere, ...] = ()
    collision_pairs: tuple[tuple[str, str], ...] = ()


# ---------------------------------------------------------------- config ----

@dataclass(frozen=True)
class SafeMpcConfig:
    # experiment scale (reference config.yaml:1-3)
    test_num: int = 100
    n_steps: int = 800

    # horizon / discretization (config.yaml:5-8)
    N: int = 45
    back_hor: int = 45
    dt: float = 5e-3
    alpha: float = 10.0

    # robot (config.yaml:10-11)
    urdf_name: str = "z1"
    urdf_path: str | None = None     # defaults to the bundled asset
    n_dofs: int = 5
    n_dof_safe_set: int = 5

    # cost (config.yaml:13, 35-39)
    cost_type: str = "NLS"           # 'NLS' or 'EXT'
    Q_weight: float = 1e2
    R_weight: float = 5e-3

    # solver budgets (config.yaml:15-22; parser.py:115-122)
    solver_mode: str = "BALANCE"
    nlp_max_iter: int = 1000
    rti_iter: int = 1
    qp_max_iter: int = 200
    alpha_reduction: float = 0.3
    alpha_min: float = 1e-2
    levenberg_marquardt: float = 5e-1

    # tolerances (config.yaml:42-50)
    tol_x: float = 5e-3
    tol_tau: float = 1e-6
    tol_dyn: float = 1e-6
    tol_obs: float = 1e-4
    tol_safe_set: float = 1e-4
    eps: float = 1e-6
    tol_conv: float = 1e-3
    tol_cost: float = 1e-3

    # slack weights (config.yaml:52-54)
    q_dot_gain: float = 1e4
    ws_t: float = 1e2
    ws_r: float = 1e4

    # feature flags (config.yaml:56-59)
    obs_flag: bool = True
    abort_flag: bool = True
    use_net: bool = True

    # NN safe set (config.yaml:61-67)
    network_path: str = ""
    network_size: tuple[int, ...] = (10, 256, 1)
    act_fun: str = "gelu"

    # analytic safe set (config.yaml:69, 79-80)
    reg_term: float = 1e-6
    ddq_max: tuple[float, ...] = (0.1, 1.0, 1.666, 2.333, 2.333, 2.333)
    ddx_max: tuple[float, ...] = (0.133, 0.133, 0.133)

    # end-effector task (config.yaml:71-76)
    frame_ee: str = "gripperMover"
    ee_position: tuple[float, float, float] = (0.035, 0.0, 0.0)
    ee_ref: tuple[float, float, float] = (0.7, 0.17, 0.13)
    ee_radius: float = 0.075

    # tracking tasks (config.yaml:225-238)
    track_traj: bool = False
    traj_name: str = ""              # which trajectory ("shape8"/"circle");
    #                                  disambiguates artifact filenames
    dim_shape_8: float = 0.27
    offset_traj: tuple[float, float, float] = (0.65, 0.08, 0.1)
    theta_rot_traj: tuple[float, float, float] = (0.0, 0.0, 1.570)
    vel_max_traj: float = 0.3
    vel_const: bool = True
    n_steps_tracking: int = 5000
    acc_time: float = 0.2
    circle_rad: float = 0.13
    circle_traj_vel: float = 0.0
    circle_center_vel: float = 0.35
    circle_offset_traj: tuple[float, float, float] = (0.78, 0.4, 0.06)

    # noise / margins (config.yaml:239-244; parser CLI overrides)
    noise: float = 0.0               # model (URDF-parameter) noise percent
    control_noise: float = 0.0       # torque noise percent of tau_max
    joint_bounds_margin: float = 0.0 # percent of joint range
    collision_margin: float = 0.0    # meters

    # scene
    scene: Scene = field(default_factory=Scene)

    # runtime
    solver_type: str = "SQP_RTI"     # 'SQP_RTI' or 'SQP'
    dtype: str = "float64"           # numerics dtype for the solve path
    data_dir: str = os.path.join(REPO_ROOT, "data_noise")

    @property
    def nq(self) -> int:
        return self.n_dofs

    @property
    def globalization(self) -> str:
        # parser.py:139: FIXED_STEP under RTI, MERIT_BACKTRACKING for full SQP
        return "FIXED_STEP" if self.solver_type == "SQP_RTI" else "MERIT_BACKTRACKING"

    @property
    def effective_nlp_max_iter(self) -> int:
        # parser.py:117: rti_iter when RTI else nlp_max_iter
        return self.rti_iter if self.solver_type == "SQP_RTI" else self.nlp_max_iter

    def with_rti(self, rti: bool) -> "SafeMpcConfig":
        return replace(self, solver_type="SQP_RTI" if rti else "SQP")

    def with_(self, **kw: Any) -> "SafeMpcConfig":
        return replace(self, **kw)


def _scene_from_yaml(p: dict) -> Scene:
    planes, spheres = [], []
    for obs in p.get("obstacles") or []:
        if obs["type"] == "plane":
            planes.append(PlaneObstacle(
                name=obs["name"],
                perpendicular_axis=int(obs["perpendicular_axis"]),
                bounds=tuple(float(b) for b in obs["bounds"]),
                position=tuple(float(v) for v in obs.get("position", (0, 0, 0))),
                real_bound=int(obs.get("real_bound", 0)),
            ))
        elif obs["type"] in ("sphere-obs", "sphere"):
            spheres.append(SphereObstacle(
                name=obs["name"], radius=float(obs["radius"]),
                position=tuple(float(v) for v in obs["position"]),
                bounds=tuple(float(b) for b in obs.get("bounds", (0.0, 1e6))),
            ))
    rcaps = tuple(
        RobotCapsule(
            name=c["name"], link_name=c["link_name"], link_axis=int(c["link_axis"]),
            radius=float(c["radius"]), length=float(c["length"]),
            spatial_offset=tuple(float(v) for v in c.get("spatial_offset") or (0, 0, 0)),
            rotation_offset=tuple(float(v) for v in c.get("rotation_offset") or (0, 0, 0)),
        )
        for c in p.get("robot_capsules") or []
    )
    fcaps = tuple(
        FixedCapsule(
            name=c["name"], radius=float(c["radius"]),
            point_a=tuple(float(v) for v in c["point_A"]),
            point_b=tuple(float(v) for v in c["point_B"]),
        )
        for c in p.get("obstacles_capsules") or []
    )
    rsph = tuple(
        RobotSphere(
            name=s["name"], link_name=s["link_name"], radius=float(s["radius"]),
            spatial_offset=tuple(float(v) for v in s.get("spatial_offset") or (0, 0, 0)),
        )
        for s in p.get("spheres_robot") or []
    )
    pairs = tuple((a, b) for a, b in (p.get("collision_pairs") or []))
    return Scene(planes=tuple(planes), spheres=tuple(spheres), robot_capsules=rcaps,
                 fixed_capsules=fcaps, robot_spheres=rsph, collision_pairs=pairs)


def load_config(path: str | None = None, **overrides: Any) -> SafeMpcConfig:
    """Load a reference-schema YAML config into :class:`SafeMpcConfig`."""
    path = path or DEFAULT_CONFIG
    with open(path) as f:
        p = yaml.safe_load(f)

    def get(key, default):
        return p.get(key, default)

    cfg = SafeMpcConfig(
        test_num=int(get("test_num", 100)),
        n_steps=int(get("n_steps", 800)),
        N=int(get("N", 45)),
        back_hor=int(get("back_hor", 45)),
        dt=float(get("dt", 5e-3)),
        alpha=float(get("alpha", 10.0)),
        n_dofs=int(get("n_dofs", 5)),
        n_dof_safe_set=int(get("n_dof_safe_set", 5)),
        cost_type=str(get("cost_type", "NLS")),
        Q_weight=float(get("Q_weight", 1e2)),
        R_weight=float(get("R_weight", 5e-3)),
        solver_mode=str(get("solver_mode", "BALANCE")),
        nlp_max_iter=int(get("nlp_max_iter", 1000)),
        rti_iter=int(get("rti_iter", 1)),
        qp_max_iter=int(get("qp_max_iter", 200)),
        alpha_reduction=float(get("alpha_reduction", 0.3)),
        alpha_min=float(get("alpha_min", 1e-2)),
        levenberg_marquardt=float(get("levenberg_marquardt", 5e-1)),
        tol_x=float(get("tol_x", 5e-3)),
        tol_tau=float(get("tol_tau", 1e-6)),
        tol_dyn=float(get("tol_dyn", 1e-6)),
        tol_obs=float(get("tol_obs", 1e-4)),
        tol_safe_set=float(get("tol_safe_set", 1e-4)),
        eps=float(get("eps", 1e-6)),
        tol_conv=float(get("tol_conv", 1e-3)),
        tol_cost=float(get("tol_cost", 1e-3)),
        q_dot_gain=float(get("q_dot_gain", 1e4)),
        ws_t=float(get("ws_t", 1e2)),
        ws_r=float(get("ws_r", 1e4)),
        obs_flag=bool(get("obs_flag", True)),
        abort_flag=bool(get("abort_flag", True)),
        use_net=bool(get("use_net", True)),
        network_path=str(get("network_path", "")),
        network_size=tuple(get("network_size", (10, 256, 1))),
        act_fun=str(get("act_fun", "gelu")),
        reg_term=float(get("reg_term", 1e-6)),
        ddq_max=tuple(float(v) for v in get("ddq_max", (0.1, 1.0, 1.666, 2.333, 2.333, 2.333))),
        ddx_max=tuple(float(v) for v in get("ddx_max", (0.133, 0.133, 0.133))),
        frame_ee=str(get("frame_ee", "gripperMover")),
        ee_position=tuple(float(v) for v in get("ee_position", (0.035, 0.0, 0.0))),
        ee_ref=tuple(float(v) for v in get("ee_ref", (0.7, 0.17, 0.13))),
        ee_radius=float(get("ee_radius", 0.075)),
        track_traj=bool(get("track_traj", False)),
        dim_shape_8=float(get("dim_shape_8", 0.27)),
        offset_traj=tuple(float(v) for v in get("offset_traj", (0.65, 0.08, 0.1))),
        theta_rot_traj=tuple(float(v) for v in get("theta_rot_traj", (0.0, 0.0, 1.570))),
        vel_max_traj=float(get("vel_max_traj", 0.3)),
        vel_const=bool(get("vel_const", True)),
        n_steps_tracking=int(get("n_steps_tracking", 5000)),
        acc_time=float(get("acc_time", 0.2)),
        circle_rad=float(get("circle_rad", 0.13)),
        circle_traj_vel=float(get("circle_traj_vel", 0.0)),
        circle_center_vel=float(get("circle_center_vel", 0.35)),
        circle_offset_traj=tuple(float(v) for v in get("circle_offset_traj", (0.78, 0.4, 0.06))),
        noise=float(get("noise_mass", 0.0)),
        joint_bounds_margin=float(get("joint_bounds_margin", 0.0)),
        collision_margin=float(get("collision_margin", 0.0)),
        scene=_scene_from_yaml(p),
    )
    if overrides:
        cfg = cfg.with_(**overrides)
    return cfg


def parse_args(argv: list[str] | None = None) -> dict[str, Any]:
    """CLI flags, one-to-one with the reference (parser.py:9-34)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--system", type=str, default="z1")
    parser.add_argument("-d", "--dofs", type=int, default=4)
    parser.add_argument("-c", "--controller", type=str, default="naive",
                        help="naive, zerovel, st, stwa, htwa, receding, "
                             "real_receding, parallel, constraint_everywhere")
    parser.add_argument("-b", "--build", action="store_true")
    parser.add_argument("--alpha", type=float, default=10.0)
    parser.add_argument("--horizon", type=int, default=45)
    parser.add_argument("-a", "--activation", type=str, default="gelu")
    parser.add_argument("--back_hor", type=int, default=45)
    parser.add_argument("--noise", type=float, default=0.0)
    parser.add_argument("--control_noise", type=float, default=0.0)
    parser.add_argument("--joint_bounds_margin", type=float, default=0.0)
    parser.add_argument("--collision_margin", type=float, default=0.0)
    # TPU-native extras (no reference analogue):
    parser.add_argument("--batch", type=int, default=0,
                        help="number of problems solved per batched program "
                             "(0 = test_num)")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (f64 numerics)")
    parser.add_argument("--track", type=str, default="none",
                        choices=["none", "shape8", "circle"],
                        help="tracking task: figure-8 lemniscate or moving "
                             "circle (reference cost_definition.py:102-288)")
    parser.add_argument("--n_steps", type=int, default=None,
                        help="override episode length")
    parser.add_argument("--replan_N", type=int, default=0,
                        help="long-horizon stall-replan OCP horizon "
                             "(0 = off; see sim/replan.py)")
    parser.add_argument("--rti_iters", type=int, default=None,
                        help="SQP iterations per control step (default: "
                             "config rti_iter; >1 is the analogue of the "
                             "reference's IPOPT controller family)")
    parser.add_argument("--lm_drop", type=float, default=0.0,
                        help="EE-error threshold below which the LM "
                             "regularization is dropped per problem "
                             "(0 = off; the flagship campaign uses 5e-3 "
                             "so the LM anchor stops fighting the final "
                             "millimetre)")
    parser.add_argument("--zv_near", type=float, default=0.0,
                        help="EE-error threshold below which the terminal "
                             "velocity box closes to v_N=0 per problem "
                             "(0 = off; arrive-and-stop — kills the "
                             "near-target orbit of the EE-only cost, "
                             "round-4 near-miss diagnostic)")
    parser.add_argument("--wv_near", type=float, default=0.0,
                        help="EE-error threshold below which a terminal "
                             "velocity cost wv*||v_N||^2 joins the OCP "
                             "per problem (0 = off; the smooth "
                             "arrive-and-stop — the EE-only reach cost "
                             "leaves null-space velocity free, so the "
                             "loop can orbit the target just outside "
                             "tol_conv, round-4 run-1 census)")
    parser.add_argument("--wv", type=float, default=5.0,
                        help="terminal velocity weight used when "
                             "--wv_near triggers")
    parser.add_argument("--handover", type=float, default=0.0,
                        help="in-graph guidance handover radius: once "
                             "the true task EE error is below this, an "
                             "active guidance plan is ignored tick-by-"
                             "tick (0 = off; host hooks alone then "
                             "release guidance — a problem arriving "
                             "near the target after the LAST hook "
                             "keeps tracking its plan with the "
                             "near-target machinery disabled)")
    parser.add_argument("--segment", type=int, default=100,
                        help="closed-loop scan segment length (smaller = "
                             "more replan/finisher hooks per episode, "
                             "more host round-trips)")
    parser.add_argument("--end_segment", type=int, default=0,
                        help="split the last full segment into chunks of "
                             "this length (0 = off) so replanner/finisher "
                             "hooks keep firing near the episode end")
    parser.add_argument("--warm", action="store_true",
                        help="cross-tick interior-point warm start in the "
                             "closed loop (the headline-bench "
                             "configuration; rti_iters must be 1 — see "
                             "ClosedLoopSim warm_start)")
    parser.add_argument("--planlib", type=str, default="auto",
                        help="offline f64 plan library for the stall "
                             "replanner (apps/plan_library.py): 'auto' "
                             "uses {guess prefix}_planlib.npz when "
                             "present, 'off' disables, else a path")
    parser.add_argument("--jobs", type=int, default=0,
                        help="max concurrent f64 worker subprocesses "
                             "(apps/plan_library.py; 0 = default 4)")
    parser.add_argument("--out_dir", type=str, default=None,
                        help="override the artifact directory (use a "
                             "scratch dir for debug runs so canonical "
                             "pickles aren't clobbered)")
    parser.add_argument("--network_path", type=str, default=None,
                        help="override the safe-set net checkpoint "
                             "(config network_path; .pt or .npz — for "
                             "retrain A/B runs)")
    return vars(parser.parse_args(argv))


def config_from_args(args: dict[str, Any], rti: bool = True) -> SafeMpcConfig:
    """Apply CLI overrides on top of the YAML config (reference mpc.py:14-25)."""
    cfg = load_config(args.get("config"))
    cfg = cfg.with_(
        urdf_name=args.get("system", cfg.urdf_name),
        alpha=args.get("alpha", cfg.alpha),
        N=args.get("horizon", cfg.N),
        back_hor=args.get("back_hor", cfg.back_hor),
        act_fun=args.get("activation", cfg.act_fun),
        noise=args.get("noise", cfg.noise),
        control_noise=args.get("control_noise", cfg.control_noise),
        joint_bounds_margin=args.get("joint_bounds_margin", cfg.joint_bounds_margin),
        collision_margin=args.get("collision_margin", cfg.collision_margin),
        solver_type="SQP_RTI" if rti else "SQP",
    )
    if args.get("out_dir"):
        os.makedirs(args["out_dir"], exist_ok=True)
        cfg = cfg.with_(data_dir=args["out_dir"])
    if args.get("network_path"):
        cfg = cfg.with_(network_path=args["network_path"])
    return cfg
