"""Tasks layer: trajectory generators, Halton sampling, IK."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.tasks.ik import solve_ik_multistart
from safe_mpc_tpu.tasks.sampling import sample_initial_states
from safe_mpc_tpu.tasks.trajectories import (_lemniscate_velocity,
                                             generate_8shape_trajectory,
                                             generate_moving_circle_trajectory,
                                             get_trajectory)


@pytest.fixture(scope="module")
def model():
    return ManipulatorModel(load_config().with_(use_net=False))


def test_lemniscate_derivative_closed_form():
    # |dp/dtheta| closed form vs finite differences
    a = 0.27
    for th in np.linspace(0.1, 6.0, 17):
        eps = 1e-6

        def p(t):
            s, c = np.sin(t), np.cos(t)
            return np.array([a * c / (1 + s * s), a * c * s / (1 + s * s)])

        fd = np.linalg.norm((p(th + eps) - p(th - eps)) / (2 * eps))
        np.testing.assert_allclose(_lemniscate_velocity(th, a), fd, rtol=1e-5)


def test_shape8_trajectory_properties():
    cfg = load_config().with_(n_steps_tracking=400)
    traj = generate_8shape_trajectory(cfg, N=10)
    assert traj.shape == (3, 400 + 1 + 10)
    # starts at the rotated+offset lemniscate point at theta=0: (a, 0, 0)
    from safe_mpc_tpu.models.geometry import rot_z
    start = rot_z(cfg.theta_rot_traj[2])[:3, :3] @ np.array(
        [cfg.dim_shape_8, 0, 0]) + np.asarray(cfg.offset_traj)
    np.testing.assert_allclose(traj[:, 0], start, atol=1e-12)
    # constant-speed parameterization: successive EE steps ~ vel_max * dt
    d = np.linalg.norm(np.diff(traj, axis=1), axis=0)
    np.testing.assert_allclose(d[5:100], cfg.vel_max_traj * cfg.dt, rtol=0.05)


def test_moving_circle_hysteresis():
    cfg = load_config().with_(n_steps_tracking=3000)
    traj = generate_moving_circle_trajectory(cfg, N=5)
    # the drift oscillates: y stays within the +-0.5 switching band (+ radius)
    assert traj[1].min() > -0.75 and traj[1].max() < 0.95
    # drift direction actually switches at least once
    dy = np.diff(traj[1])
    assert (dy > 0).any() and (dy < 0).any()


def test_regulation_trajectory(model):
    cfg = model.cfg
    traj = get_trajectory(cfg, "regulation", N=7)
    assert traj.shape == (3, cfg.n_steps + 1 + 7)
    np.testing.assert_allclose(traj[:, 0], cfg.ee_ref)
    np.testing.assert_allclose(traj.std(axis=1), 0.0, atol=1e-12)


def test_halton_sampling_collision_free(model):
    xs = sample_initial_states(model, 16)
    assert xs.shape == (16, model.nx)
    ok = jax.vmap(model.check_collision)(xs)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(xs[:, model.nq:]), 0.0)
    # deterministic (unscrambled Halton, reference parity)
    xs2 = sample_initial_states(model, 16)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs2), atol=0)


def test_ik_reaches_target(model):
    target = jnp.asarray([0.35, 0.1, 0.3])
    x, ok = solve_ik_multistart(model, target, n_starts=8)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(model.ee_pos(x)),
                               np.asarray(target), atol=1e-4)
    assert bool(model.check_collision(x))
