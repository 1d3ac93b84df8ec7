"""Pallas Riccati kernel vs the jnp batch-last sweep (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.ops.pallas_riccati import TILE, riccati_pallas
from safe_mpc_tpu.ops.qp_batched import _riccati_last


def make(seed, N=10, nx=6, nu=3, Bt=TILE):
    rng = np.random.default_rng(seed)
    A = np.eye(nx) + 0.1 * rng.standard_normal((nx, nx))
    B = 0.2 * rng.standard_normal((nx, nu))

    def spd(n):
        X = rng.standard_normal((Bt, n, n))
        M = np.einsum("bij,bkj->bik", X, X) / n + np.eye(n)
        return np.moveaxis(M, 0, -1)

    c = np.moveaxis(0.1 * rng.standard_normal((Bt, N, nx)), 0, -1)
    dx0 = np.moveaxis(rng.standard_normal((Bt, nx)), 0, -1)
    Q = np.stack([spd(nx) for _ in range(N + 1)])
    R = np.stack([spd(nu) for _ in range(N)])
    q = np.moveaxis(rng.standard_normal((Bt, N + 1, nx)), 0, -1)
    r = np.moveaxis(rng.standard_normal((Bt, N, nu)), 0, -1)
    S = np.moveaxis(0.1 * rng.standard_normal((Bt, N, nx, nu)), 0, -1)
    return [jnp.asarray(a) for a in (A, B, c, dx0, Q, q, R, r, S)]


def test_pallas_matches_jnp_interpret():
    args = make(0)
    dx_ref, du_ref = _riccati_last(*args)
    dx, du = riccati_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref), atol=1e-8)


def test_pallas_multi_tile():
    args = make(1, Bt=2 * TILE)
    dx_ref, du_ref = _riccati_last(*args)
    dx, du = riccati_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-8)
