"""Native C++ Riccati oracle vs the JAX Riccati sweep."""

import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.ops.qp import _riccati_solve

native = pytest.importorskip("safe_mpc_tpu.utils.native")


def make_problem(seed, N=12, nx=6, nu=3):
    rng = np.random.default_rng(seed)
    A = np.eye(nx) + 0.1 * rng.standard_normal((nx, nx))
    B = 0.2 * rng.standard_normal((nx, nu))
    c = 0.1 * rng.standard_normal((N, nx))
    x0 = rng.standard_normal(nx)

    def spd(n):
        X = rng.standard_normal((n, n))
        return X @ X.T / n + np.eye(n)

    Q = np.stack([spd(nx) for _ in range(N + 1)])
    R = np.stack([spd(nu) for _ in range(N)])
    q = rng.standard_normal((N + 1, nx))
    r = rng.standard_normal((N, nu))
    S = 0.1 * rng.standard_normal((N, nx, nu))
    return A, B, c, x0, Q, q, R, r, S


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_jax(seed):
    A, B, c, x0, Q, q, R, r, S = make_problem(seed)
    xs_n, us_n = native.riccati_lqr(A, B, c, x0, Q, q, R, r, S)
    xs_j, us_j = _riccati_solve(
        *[jnp.asarray(a) for a in (A, B, c, x0, Q, q, R, r, S)])
    np.testing.assert_allclose(xs_n, np.asarray(xs_j), atol=1e-9)
    np.testing.assert_allclose(us_n, np.asarray(us_j), atol=1e-9)


def test_native_dynamics_feasible():
    A, B, c, x0, Q, q, R, r, S = make_problem(5)
    xs, us = native.riccati_lqr(A, B, c, x0, Q, q, R, r, S)
    for k in range(us.shape[0]):
        np.testing.assert_allclose(xs[k + 1], A @ xs[k] + B @ us[k] + c[k],
                                   atol=1e-10)
