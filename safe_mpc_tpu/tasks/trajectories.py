"""Reference trajectory generators: figure-8 lemniscate and moving circle.

Closed-form ports of the reference's sympy-based generators
(cost_definition.py:170-199, 264-288): the lemniscate of Gerono variant
``x = a cos(t)/(1+sin^2 t), y = a cos t sin t/(1+sin^2 t)`` with Euler
arc-length reparameterization (theta advances by v/|dp/dt| * dt each step),
optional velocity ramp-up over `acc_time`, then rotation + offset; and the
circle + oscillating linear drift with the +-0.5 m direction-switch
hysteresis.
"""

from __future__ import annotations

import numpy as np

from ..config import SafeMpcConfig
from ..models.geometry import rot_x, rot_y, rot_z


def _lemniscate_velocity(theta: float, a: float) -> float:
    """|d(x,y)/dtheta| for the lemniscate (derivatives in closed form;
    replaces the reference's sympy.diff + lambdify, cost_definition.py:123-132)."""
    s, c = np.sin(theta), np.cos(theta)
    denom = (1 + s * s) ** 2
    dx = -a * s * (3 - s * s) / denom
    dy = a * (np.cos(2 * theta) * (1 + s * s) - 2 * s * s * c * c) / denom
    return np.sqrt(dx * dx + dy * dy)


def generate_8shape_trajectory(cfg: SafeMpcConfig, N: int | None = None) -> np.ndarray:
    """(3, n_steps_tracking + 1 + N) EE reference (cost_definition.py:170-199)."""
    N = int(N if N is not None else cfg.N)
    a = cfg.dim_shape_8
    T = cfg.n_steps_tracking + 1 + N
    if cfg.vel_const:
        velocity = cfg.vel_max_traj
        acc = 0.0
    else:
        velocity = 0.0
        acc = cfg.vel_max_traj / (cfg.n_steps_tracking * cfg.acc_time)
    traj = np.zeros((3, T))
    theta = 0.0
    for i in range(T):
        s, c = np.sin(theta), np.cos(theta)
        traj[:, i] = [a * c / (1 + s * s), a * c * s / (1 + s * s), 0.0]
        theta += (velocity / _lemniscate_velocity(theta, a)) * cfg.dt
        if not cfg.vel_const and velocity <= cfg.vel_max_traj:
            velocity += acc
    R = (rot_x(cfg.theta_rot_traj[0]) @ rot_y(cfg.theta_rot_traj[1])
         @ rot_z(cfg.theta_rot_traj[2]))[:3, :3]
    return R @ traj + np.asarray(cfg.offset_traj).reshape(3, 1)


def generate_moving_circle_trajectory(cfg: SafeMpcConfig,
                                      N: int | None = None) -> np.ndarray:
    """(3, n_steps_tracking + 1 + N) circle + oscillating drift
    (cost_definition.py:264-288), including the reference's +-0.5 m
    hysteresis on the drift direction."""
    N = int(N if N is not None else cfg.N)
    T = cfg.n_steps_tracking + 1 + N
    if cfg.vel_const:
        velocity = cfg.circle_traj_vel
        acc = 0.0
    else:
        velocity = 0.0
        acc = cfg.circle_traj_vel / (cfg.n_steps_tracking * cfg.acc_time)
    traj = np.zeros((3, T))
    linear = np.zeros(3)
    theta = 0.0
    sign_vel = 1.0
    for i in range(T):
        circle = cfg.circle_rad * np.array([-np.cos(theta), np.sin(theta), 0.0])
        linear = linear - sign_vel * np.array(
            [0.0, cfg.circle_center_vel * cfg.dt, 0.0])
        traj[:, i] = circle + linear + np.asarray(cfg.circle_offset_traj)
        theta += (velocity / np.sqrt(cfg.circle_rad)) * cfg.dt
        if sign_vel > 0 and traj[1, i] < -0.5:
            sign_vel = -1.0
        if sign_vel < 0 and traj[1, i] > 0.5:
            sign_vel = 1.0
        if not cfg.vel_const and velocity <= cfg.circle_traj_vel:
            velocity += acc
    return traj


def regulation_trajectory(cfg: SafeMpcConfig, N: int | None = None) -> np.ndarray:
    """Constant ee_ref reference (cost_definition.py:32,67)."""
    N = int(N if N is not None else cfg.N)
    return np.tile(np.asarray(cfg.ee_ref)[:, None], (1, cfg.n_steps + 1 + N))


def get_trajectory(cfg: SafeMpcConfig, kind: str = "regulation",
                   N: int | None = None) -> np.ndarray:
    kinds = {
        "regulation": regulation_trajectory,
        "shape8": generate_8shape_trajectory,
        "moving_circle": generate_moving_circle_trajectory,
        "circle": generate_moving_circle_trajectory,
    }
    return kinds[kind](cfg, N)
