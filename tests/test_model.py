"""Manipulator model tests: dynamics step, torque map, plant, collisions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.models import geometry as geom


@pytest.fixture(scope="module")
def model():
    return ManipulatorModel(load_config())


def rand_x(model, seed=0, vel_scale=0.5):
    rng = np.random.default_rng(seed)
    q = rng.uniform(model.x_min[: model.nq], model.x_max[: model.nq])
    v = vel_scale * rng.uniform(-1, 1, model.nq)
    return jnp.concatenate([jnp.array(q), jnp.array(v)])


def test_double_integrator_step(model):
    x = rand_x(model, 0)
    u = jnp.ones(model.nu)
    xn = model.step(x, u)
    dt = model.dt
    np.testing.assert_allclose(
        xn[: model.nq], x[: model.nq] + dt * x[model.nq:] + 0.5 * dt * dt, atol=1e-14)
    np.testing.assert_allclose(xn[model.nq:], x[model.nq:] + dt, atol=1e-14)


def test_tau_linear_in_u(model):
    # tau(x, u) = M(q) u + h(q, v): affine in u with slope M(q).
    x = rand_x(model, 1)
    u = jnp.array(np.random.default_rng(2).uniform(-1, 1, model.nu))
    t0 = model.tau(x, jnp.zeros(model.nu))
    t1 = model.tau(x, u)
    M = model.robot.mass_matrix(x[: model.nq])
    np.testing.assert_allclose(t1 - t0, M @ u, atol=1e-10)


def test_plant_step_no_noise_matches_nominal(model):
    # With zero noise and torques within bounds, the plant step equals the
    # nominal double integrator (saturation resolve is the identity).
    x = rand_x(model, 3, vel_scale=0.1)
    u = 0.1 * jnp.ones(model.nu)
    xn, u_act = model.plant_step(x, u, jax.random.PRNGKey(0))
    np.testing.assert_allclose(u_act, u, atol=1e-9)
    np.testing.assert_allclose(xn, model.step(x, u), atol=1e-9)


def test_plant_step_saturates(model):
    x = rand_x(model, 4, vel_scale=0.0)
    u = 1e4 * jnp.ones(model.nu)  # would exceed torque limits
    xn, u_act = model.plant_step(x, u, jax.random.PRNGKey(0))
    tau = model.tau(x, u_act)
    assert np.all(np.abs(tau) <= model.tau_max + 1e-6)
    assert not np.allclose(u_act, u)


def test_check_state_bounds(model):
    x = jnp.asarray((model.x_min + model.x_max) / 2)
    assert bool(model.check_state_bounds(x))
    assert not bool(model.check_state_bounds(x.at[0].set(model.x_max[0] + 1.0)))


def test_collision_rows_compiled(model):
    # 6 capsule-capsule pairs from the default scene
    assert model.n_collision == 6
    x = rand_x(model, 5)
    vals = model.collision_values(x)
    assert vals.shape == (6,)
    assert np.all(np.asarray(vals) >= 0)  # squared distances


def test_collision_detects_contact(model):
    # Home-ish configuration far from the fixed obstacle cage is free.
    x_free = jnp.zeros(model.nx).at[1].set(1.2).at[2].set(-0.5)
    assert bool(model.check_collision(x_free))


def test_segment_distance_primitives():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.5, 1.0, -1.0])
    d = jnp.array([0.5, 1.0, 1.0])
    # closest points: (0.5,0,0) and (0.5,1,0) -> distance 1
    np.testing.assert_allclose(geom.segment_segment_sqdist(a, b, c, d), 1.0, atol=1e-4)
    # point-segment
    np.testing.assert_allclose(
        geom.point_segment_sqdist(a, b, 1.0, jnp.array([2.0, 0.0, 0.0])), 1.0, atol=1e-9)
    np.testing.assert_allclose(
        geom.point_segment_sqdist(a, b, 1.0, jnp.array([0.5, 2.0, 0.0])), 4.0, atol=1e-9)


def test_segment_distance_parallel_regularized():
    # Parallel segments: the 1e-5 regulariser keeps gradients finite.
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    d = jnp.array([1.0, 1.0, 0.0])
    val, grad = jax.value_and_grad(
        lambda cc: geom.segment_segment_sqdist(a, b, cc, d))(c)
    np.testing.assert_allclose(val, 1.0, atol=1e-3)
    assert np.all(np.isfinite(grad))


def test_check_dynamics_consistency(model):
    x0 = rand_x(model, 6, vel_scale=0.1)
    us = 0.05 * jnp.ones((10, model.nu))
    xs = model.rollout(x0, us)
    assert bool(model.check_dynamics(xs, us))
    assert not bool(model.check_dynamics(xs.at[3, 0].add(1e-3), us))


def test_batched_plant_vmap(model):
    xs = jnp.stack([rand_x(model, s, 0.1) for s in range(8)])
    us = 0.1 * jnp.ones((8, model.nu))
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    xn, _ = jax.vmap(model.plant_step)(xs, us, keys)
    assert xn.shape == xs.shape


def rand_X(model, K, seed=0, vel_scale=0.5):
    """Batch-last random states (nx, K)."""
    rng = np.random.default_rng(seed)
    q = rng.uniform(model.x_min[: model.nq], model.x_max[: model.nq],
                    (K, model.nq))
    v = vel_scale * rng.uniform(-1, 1, (K, model.nq))
    return jnp.concatenate([jnp.asarray(q), jnp.asarray(v)], axis=1).T


def test_collision_linearize_bl_matches_per_sample(model):
    """Batch-last collision values + Jacobians pin to the per-sample path
    (the lane-packed layout feeding the batched transcription)."""
    K = 6
    X = rand_X(model, K, seed=21)
    poses_bl = model.robot.joint_poses_bl(X[: model.nq])
    vals_bl, J_bl = model.collision_linearize_bl(X, poses_bl)
    for k in range(K):
        vals, J = model.collision_linearize(X[:, k])
        np.testing.assert_allclose(vals_bl[:, k], vals, atol=1e-11)
        np.testing.assert_allclose(J_bl[..., k], J, atol=1e-11)


def test_collision_value_bl_matches_fn(model):
    """Row values via the batch-last ops equal collision_values."""
    from safe_mpc_tpu.models.manipulator import _BatchLastOps
    K = 4
    X = rand_X(model, K, seed=22)
    poses_bl = model.robot.joint_poses_bl(X[: model.nq])
    ops = _BatchLastOps(model.robot)
    vals_bl = jnp.stack([r.fn(X, poses_bl, ops)
                         for r in model.collision_rows])
    for k in range(K):
        vals = model.collision_values(X[:, k])
        np.testing.assert_allclose(vals_bl[:, k], vals, atol=1e-11)
