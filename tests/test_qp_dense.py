"""Condensed dense-KKT backend vs the Riccati backend: same solution.

The dense path (`kkt="dense"`, ops/qp_batched.py::_dense_kkt_last)
eliminates the states through the shared LTI dynamics and solves one
batched (N*nu)^2 Cholesky system — the batch-major MXU formulation
(VERDICT r3 task 7). Both backends solve the identical Newton/KKT
system per IP iteration, so full solves must agree to solver accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.ops.qp_batched import (_dense_kkt_last, _riccati_last,
                                         solve_qp_batched)

from test_qp import make_data  # noqa: E402  (same directory)
from test_qp_batched import _stack  # noqa: E402


def test_dense_kkt_matches_riccati_single_system():
    """One equality-constrained KKT solve: dense == Riccati to 1e-9."""
    rng = np.random.default_rng(0)
    N, nx, nu, B = 7, 4, 2, 3
    A = jnp.asarray(rng.standard_normal((nx, nx)) * 0.3
                    + np.eye(nx))
    Bm = jnp.asarray(rng.standard_normal((nx, nu)))
    c = jnp.asarray(rng.standard_normal((N, nx, B)))
    dx0 = jnp.asarray(rng.standard_normal((nx, B)))
    # SPD stage Hessians
    M = rng.standard_normal((N + 1, nx, nx, B))
    Qb = jnp.asarray(np.einsum("tikb,tjkb->tijb", M, M)
                     + 0.5 * np.eye(nx)[None, :, :, None])
    Mr = rng.standard_normal((N, nu, nu, B))
    Rb = jnp.asarray(np.einsum("tikb,tjkb->tijb", Mr, Mr)
                     + 0.5 * np.eye(nu)[None, :, :, None])
    Sb = jnp.asarray(rng.standard_normal((N, nx, nu, B)) * 0.1)
    qb = jnp.asarray(rng.standard_normal((N + 1, nx, B)))
    rb = jnp.asarray(rng.standard_normal((N, nu, B)))

    dx_r, du_r = _riccati_last(A, Bm, c, dx0, Qb, qb, Rb, rb, Sb)
    dx_d, du_d = _dense_kkt_last(A, Bm, c, dx0, Qb, qb, Rb, rb, Sb)
    np.testing.assert_allclose(np.asarray(dx_d), np.asarray(dx_r),
                               atol=2e-8)
    np.testing.assert_allclose(np.asarray(du_d), np.asarray(du_r),
                               atol=2e-8)


def test_dense_backend_full_solve_matches():
    """Full IP solves agree across backends on the synthetic QP batch."""
    datas = [make_data(s, soft_rows=1) for s in range(4)]
    batched = _stack(datas)
    ref = solve_qp_batched(batched, iters=25)
    out = solve_qp_batched(batched, iters=25, kkt="dense")
    np.testing.assert_allclose(np.asarray(out.dx), np.asarray(ref.dx),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.du), np.asarray(ref.du),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
