"""Horizon-parallel Riccati (`ops/riccati_assoc.py`) pinned against the
sequential sweep (`qp._riccati_solve`) on random cross-term LQR data,
and end-to-end inside the IP solver via `solve_qp(horizon_parallel=True)`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.ops.qp import _riccati_solve
from safe_mpc_tpu.ops.riccati_assoc import riccati_assoc


def _random_lqr(key, N=45, nx=10, nu=5, dtype=jnp.float64):
    ks = jax.random.split(key, 9)
    dt = 5e-3
    A = jnp.eye(nx, dtype=dtype).at[:nx // 2, nx // 2:].set(
        dt * jnp.eye(nx // 2, dtype=dtype))
    B = jnp.concatenate([0.5 * dt ** 2 * jnp.eye(nu, dtype=dtype),
                         dt * jnp.eye(nu, dtype=dtype)], axis=0)
    c = 0.1 * jax.random.normal(ks[0], (N, nx), dtype)
    dx0 = jax.random.normal(ks[1], (nx,), dtype)

    def spd(k, n, m, scale):
        G = jax.random.normal(k, (m, n, n), dtype)
        return scale * (jnp.einsum("kij,klj->kil", G, G)
                        + n * jnp.eye(n, dtype=dtype))

    Qb = spd(ks[2], nx, N + 1, 1.0)
    Rb = spd(ks[3], nu, N, 0.5)
    # small cross terms keep the stage Hessian [[Q,S],[S',R]] PD
    Sb = 0.05 * jax.random.normal(ks[4], (N, nx, nu), dtype)
    qb = jax.random.normal(ks[5], (N + 1, nx), dtype)
    rb = jax.random.normal(ks[6], (N, nu), dtype)
    return A, B, c, dx0, Qb, qb, Rb, rb, Sb


@pytest.mark.parametrize("N", [1, 2, 7, 45])
def test_matches_sequential(N):
    args = _random_lqr(jax.random.PRNGKey(0), N=N)
    dx_s, du_s = _riccati_solve(*args)
    dx_p, du_p = riccati_assoc(*args)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               rtol=1e-9, atol=1e-9)


def test_matches_sequential_f32():
    args = _random_lqr(jax.random.PRNGKey(1), N=45, dtype=jnp.float32)
    dx_s, du_s = _riccati_solve(*args)
    dx_p, du_p = riccati_assoc(*args)
    scale = float(jnp.max(jnp.abs(du_s)))
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s),
                               atol=3e-4 * max(scale, 1.0))


def test_solve_qp_horizon_parallel():
    """The full IP solver with the horizon-parallel backend agrees with
    the sequential one on a real transcribed OCP."""
    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.base import MPCController
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.ops.qp import solve_qp

    cfg = load_config().with_(N=15, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = MPCController(model, N=15)
    x0 = jnp.asarray((model.x_min + model.x_max) / 2).at[0].add(0.3)
    st = ctrl.guess_correction(ctrl.initial_state(x0))
    sched = ctrl.schedule(st)
    data = ctrl.spec.transcribe(st.xg, st.ug, x0, sched)

    sol_s = solve_qp(data, iters=20)
    sol_p = solve_qp(data, iters=20, horizon_parallel=True)
    assert int(sol_s.status) == 0 and int(sol_p.status) == 0
    np.testing.assert_allclose(np.asarray(sol_p.du), np.asarray(sol_s.du),
                               rtol=1e-6, atol=1e-8)


def test_rti_step_batched_horizon_parallel():
    """The batched RTI entry point with horizon_parallel=True matches the
    sequential backend on a small batch."""
    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.ops.sqp import rti_step_batched
    from safe_mpc_tpu.tasks.sampling import sample_initial_states

    cfg = load_config().with_(N=10, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("receding", model, N=10)
    x0s = sample_initial_states(model, 4, margin=0.05)
    states = jax.vmap(ctrl.initial_state)(x0s)
    sched = ctrl.schedule(ctrl.initial_state(x0s[0]))

    res_s = rti_step_batched(ctrl.spec, states.xg, states.ug, x0s, sched,
                             qp_iters=15)
    res_p = rti_step_batched(ctrl.spec, states.xg, states.ug, x0s, sched,
                             qp_iters=15, horizon_parallel=True)
    np.testing.assert_allclose(np.asarray(res_p.us), np.asarray(res_s.us),
                               rtol=1e-6, atol=1e-8)
