"""Rigid-body model tests: FK, Jacobians, mass matrix, bias force.

Validation strategy (SURVEY.md §4): finite differences + physical
invariants (symmetry, positive definiteness, energy conservation,
Coriolis skew-symmetry) instead of comparison against adam-robotics,
which is not importable here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.models.robot import RobotModel, InertialParams
from safe_mpc_tpu.models.urdf import asset_path


@pytest.fixture(scope="module")
def robot():
    return RobotModel(asset_path("z1"), n_dofs=5)


def rand_qv(robot, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(robot.q_min, robot.q_max)
    v = rng.uniform(-1.0, 1.0, robot.nq)
    return jnp.array(q), jnp.array(v)


def test_urdf_parse_limits(robot):
    assert robot.nq == 5
    np.testing.assert_allclose(robot.q_min[1], 0.0)
    np.testing.assert_allclose(robot.q_max[1], 2.9670597)
    np.testing.assert_allclose(robot.tau_max, [30.0, 60.0, 30.0, 30.0, 30.0])
    np.testing.assert_allclose(robot.dq_max, 3.1415)


def test_fk_zero_config(robot):
    # At q=0 the chain folds along the URDF origins.
    p = robot.frame_position(jnp.zeros(5), "gripperMover")
    # x: -0.35 + 0.218 + 0.07 + 0.0492 (joint6 locked) + 0.051 + 0.049
    assert np.isclose(p[2], 0.0585 + 0.045 + 0.057, atol=1e-12)
    assert np.isclose(p[0], -0.35 + 0.218 + 0.07 + 0.0492 + 0.051 + 0.049, atol=1e-12)


def test_fk_base_yaw(robot):
    # Rotating joint1 by pi/2 maps x -> y for the EE position.
    q0 = jnp.zeros(5)
    p0 = robot.frame_position(q0, "gripperMover")
    q1 = q0.at[0].set(jnp.pi / 2)
    p1 = robot.frame_position(q1, "gripperMover")
    assert np.isclose(p1[1], p0[0], atol=1e-12)
    assert np.isclose(p1[2], p0[2], atol=1e-12)


def test_frame_jacobian_fd(robot):
    q, v = rand_qv(robot, 1)
    J = robot.frame_jacobian(q, "gripperMover")[:3]
    Jfd = jax.jacfwd(lambda qq: robot.frame_position(qq, "gripperMover"))(q)
    np.testing.assert_allclose(J, Jfd, atol=1e-10)


def test_frame_jacobian_angular_fd(robot):
    # R_dot R^T = skew(omega) with omega = Jw v.
    q, v = rand_qv(robot, 2)
    Jw = robot.frame_jacobian(q, "gripperMover")[3:]
    Rfun = lambda qq: robot.frame_pose(qq, "gripperMover")[0]
    R, Rdot = jax.jvp(Rfun, (q,), (v,))
    omega_skew = Rdot @ R.T
    omega = jnp.array([omega_skew[2, 1], omega_skew[0, 2], omega_skew[1, 0]])
    np.testing.assert_allclose(Jw @ v, omega, atol=1e-10)


def test_mass_matrix_spd(robot):
    q, _ = rand_qv(robot, 3)
    M = robot.mass_matrix(q)
    np.testing.assert_allclose(M, M.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)


def test_mass_matrix_kinetic_energy_fd(robot):
    # v^T M v equals the summed body kinetic energies computed from body
    # velocities obtained by jvp through the body-frame kinematics.
    q, v = rand_qv(robot, 4)
    params = robot.default_params

    def body_state(qq):
        R, p = robot._body_frames(qq, params)
        return R, p

    (R, p), (Rdot, pdot) = jax.jvp(body_state, (q,), (v,))
    ke = 0.0
    for b in range(robot.nb):
        w_skew = Rdot[b] @ R[b].T
        w = jnp.array([w_skew[2, 1], w_skew[0, 2], w_skew[1, 0]])
        Iw = R[b] @ params.inertia[b] @ R[b].T
        ke += 0.5 * params.mass[b] * pdot[b] @ pdot[b] + 0.5 * w @ Iw @ w
    np.testing.assert_allclose(0.5 * v @ robot.mass_matrix(q) @ v, ke, rtol=1e-8)


def test_gravity_matches_bias_at_zero_velocity(robot):
    q, _ = rand_qv(robot, 5)
    np.testing.assert_allclose(
        robot.bias_force(q, jnp.zeros(5)), robot.gravity_term(q), atol=1e-10
    )


def test_coriolis_skew_symmetry(robot):
    # Mdot - 2C must be skew-symmetric: v^T (Mdot - 2C) v = 0, equivalently
    # power balance: v^T (h(q,v) - g(q)) == 1/2 v^T Mdot v.
    q, v = rand_qv(robot, 6)
    _, Mdot = jax.jvp(lambda qq: robot.mass_matrix(qq), (q,), (v,))
    lhs = v @ (robot.bias_force(q, v) - robot.gravity_term(q))
    np.testing.assert_allclose(lhs, 0.5 * v @ Mdot @ v, rtol=1e-9)


def test_energy_conservation_unforced(robot):
    # Simulate unforced dynamics with RK4; total energy must be conserved.
    q, v = rand_qv(robot, 7)
    v = 0.3 * v

    def f(state):
        q, v = state[: robot.nq], state[robot.nq:]
        a = robot.forward_dynamics(q, v, jnp.zeros(robot.nq))
        return jnp.concatenate([v, a])

    def rk4(state, dt):
        k1 = f(state)
        k2 = f(state + 0.5 * dt * k1)
        k3 = f(state + 0.5 * dt * k2)
        k4 = f(state + dt * k3)
        return state + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    def energy(state):
        q, v = state[: robot.nq], state[robot.nq:]
        return 0.5 * v @ robot.mass_matrix(q) @ v + robot.potential_energy(q)

    state = jnp.concatenate([q, v])
    e0 = energy(state)
    step = jax.jit(lambda s: rk4(s, 1e-3))
    for _ in range(200):
        state = step(state)
    assert abs(energy(state) - e0) < 1e-6 * max(1.0, abs(e0))


def test_inverse_forward_dynamics_roundtrip(robot):
    q, v = rand_qv(robot, 8)
    a = jnp.array(np.random.default_rng(9).uniform(-2, 2, robot.nq))
    tau = robot.inverse_dynamics(q, v, a)
    np.testing.assert_allclose(robot.forward_dynamics(q, v, tau), a, atol=1e-9)


def test_batched_inertial_params(robot):
    # Noise ensembles = vmapped InertialParams (replaces URDF rewriting).
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    params = jax.vmap(lambda k: robot.default_params.perturbed(k, 5.0, 5.0, 5.0))(keys)
    q, v = rand_qv(robot, 10)
    taus = jax.vmap(lambda p: robot.bias_force(q, v, p))(params)
    assert taus.shape == (4, robot.nq)
    # different noise draws -> different bias forces
    assert np.std(np.asarray(taus), axis=0).max() > 0


def test_n_dofs_4_subchain():
    robot4 = RobotModel(asset_path("z1"), n_dofs=4)
    robot5 = RobotModel(asset_path("z1"), n_dofs=5)
    q = jnp.array([0.3, 0.7, -0.4, 0.2])
    p4 = robot4.frame_position(q, "gripperMover")
    p5 = robot5.frame_position(jnp.concatenate([q, jnp.zeros(1)]), "gripperMover")
    np.testing.assert_allclose(p4, p5, atol=1e-12)


# ---------------------------------------------------------------- closed form


def test_kin_derivatives_vs_ad_oracle(robot):
    """Closed-form geometric (M, dM, ddM, gU, HU) pins to the nested-jacfwd
    autodiff tower (dynamics_derivative_stack_ad) — the equivalence that
    licenses using the cheap path in the RTI hot loop."""
    for seed in range(3):
        q, _ = rand_qv(robot, seed)
        ref = robot.dynamics_derivative_stack_ad(q)
        got = robot._kin_derivatives(q, None, order=2)
        for name, a, b in zip(("M", "dM", "ddM", "gU", "HU"), got, ref):
            np.testing.assert_allclose(a, b, atol=5e-11, err_msg=name)


def test_kin_derivatives_order1_vs_ad(robot):
    q, _ = rand_qv(robot, 7)
    M_ref, dM_ref, _, gU_ref, _ = robot.dynamics_derivative_stack_ad(q)
    M, dM, gU = robot._kin_derivatives(q, None, order=1)
    np.testing.assert_allclose(M, M_ref, atol=5e-11)
    np.testing.assert_allclose(dM, dM_ref, atol=5e-11)
    np.testing.assert_allclose(gU, gU_ref, atol=5e-11)


def test_kin_derivatives_perturbed_params(robot):
    """Closed form must track per-problem inertial noise too."""
    params = robot.default_params.perturbed(jax.random.PRNGKey(3),
                                            10.0, 10.0, 10.0)
    q, _ = rand_qv(robot, 2)
    ref = robot.dynamics_derivative_stack_ad(q, params)
    got = robot._kin_derivatives(q, params, order=2)
    for name, a, b in zip(("M", "dM", "ddM", "gU", "HU"), got, ref):
        np.testing.assert_allclose(a, b, atol=5e-11, err_msg=name)


def test_dynamics_terms_uses_closed_form(robot):
    """dynamics_terms (closed-form gated) equals the AD Lagrangian bias."""
    q, v = rand_qv(robot, 4)
    M, h = robot.dynamics_terms(q, v)
    # independent check: h = Mdot v - d/dq (0.5 v'Mv) + g via AD
    Mfun = lambda qq: robot.mass_matrix(qq)
    dM = jax.jacfwd(Mfun)(q)
    Mdot_v = jnp.einsum("ijk,k,j->i", dM, v, v)
    quad = 0.5 * jnp.einsum("j,jki,k->i", v, dM, v)
    expect = Mdot_v - quad + robot.gravity_term(q)
    np.testing.assert_allclose(h, expect, atol=5e-11)
    np.testing.assert_allclose(M, Mfun(q), atol=5e-12)


# ---------------------------------------------------------------- batch-last


def test_joint_poses_bl_matches_per_sample(robot):
    rng = np.random.default_rng(11)
    Q = jnp.asarray(rng.uniform(robot.q_min, robot.q_max, (8, robot.nq)))
    R_bl, p_bl, a_bl = robot.joint_poses_bl(Q.T)
    for k in range(8):
        R, p, a = robot._joint_poses(Q[k])
        np.testing.assert_allclose(R_bl[..., k], R, atol=1e-12)
        np.testing.assert_allclose(p_bl[..., k], p, atol=1e-12)
        np.testing.assert_allclose(a_bl[..., k], a, atol=1e-12)


def test_kin_derivatives_bl_matches_per_sample(robot):
    rng = np.random.default_rng(12)
    K = 4
    Q = jnp.asarray(rng.uniform(robot.q_min, robot.q_max, (K, robot.nq)))
    out_bl = robot.kin_derivatives_bl(Q.T, order=2)
    for k in range(K):
        ref = robot._kin_derivatives(Q[k], None, order=2)
        for name, a, b in zip(("M", "dM", "ddM", "gU", "HU"), out_bl, ref):
            np.testing.assert_allclose(a[..., k], b, atol=1e-11,
                                       err_msg=f"{name}[{k}]")


def test_point_jacobian_bl_matches_per_sample(robot):
    rng = np.random.default_rng(13)
    K = 5
    Q = jnp.asarray(rng.uniform(robot.q_min, robot.q_max, (K, robot.nq)))
    poses_bl = robot.joint_poses_bl(Q.T)
    anc = robot.nq - 1
    # world point: the last joint origin itself
    pt = poses_bl[1][anc]                                    # (3, K)
    J_bl = robot.point_jacobian_bl(poses_bl, anc, pt)        # (nq, 3, K)
    for k in range(K):
        poses = robot._joint_poses(Q[k])
        J = robot.point_jacobian_from(poses, anc, pt[:, k])  # (3, nq)
        np.testing.assert_allclose(J_bl[..., k], J.T, atol=1e-12)
