"""QP solver tests: Riccati vs dense KKT, IP vs scipy, soft-slack semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import LinearConstraint, minimize

from safe_mpc_tpu.ops.qp import QPData, solve_qp


def make_data(key, N=6, nx=4, nu=2, m=3, seed_active=True, soft_rows=0,
              box=False):
    rng = np.random.default_rng(key)
    A = np.eye(nx) + 0.1 * rng.standard_normal((nx, nx))
    B = 0.1 * rng.standard_normal((nx, nu))
    c = 0.05 * rng.standard_normal((N, nx))
    dx0 = rng.standard_normal(nx) * 0.3

    def spd(n, scale=1.0):
        X = rng.standard_normal((n, n))
        return scale * (X @ X.T / n + np.eye(n))

    Q = np.stack([spd(nx) for _ in range(N + 1)])
    R = np.stack([spd(nu) for _ in range(N)])
    q = 0.3 * rng.standard_normal((N + 1, nx))
    r = 0.3 * rng.standard_normal((N, nu))

    Cx = rng.standard_normal((N + 1, m, nx))
    Cu = rng.standard_normal((N, m, nu))
    h = 0.1 * rng.standard_normal((N + 1, m))
    lo = -0.4 - rng.random((N + 1, m))
    up = 0.4 + rng.random((N + 1, m))
    active = np.ones((N + 1, m)) if seed_active else np.zeros((N + 1, m))
    soft = np.zeros((N + 1, m))
    soft[:, :soft_rows] = 1.0
    zl = 5.0 * np.ones((N + 1, m))
    zu = 5.0 * np.ones((N + 1, m))
    Zl = 2.0 * np.ones((N + 1, m))
    Zu = 2.0 * np.ones((N + 1, m))
    kw = dict(A=A, B=B, c=c, dx0=dx0, Q=Q, q=q, R=R, r=r, Cx=Cx, Cu=Cu, h=h,
              lo=lo, up=up, active=active, soft=soft, zl=zl, zu=zu, Zl=Zl,
              Zu=Zu)
    return QPData(**{k: jnp.asarray(v, dtype=jnp.float64) for k, v in kw.items()})


def dense_solve(data, with_ineq=True, with_soft=False):
    """Independent dense reference: scipy trust-constr on the explicit QP."""
    d = {k: np.asarray(getattr(data, k)) for k in
         ("A", "B", "c", "dx0", "Q", "q", "R", "r", "Cx", "Cu", "h", "lo",
          "up", "active", "soft", "zl", "zu", "Zl", "Zu")}
    N, nx = d["c"].shape
    nu = d["B"].shape[1]
    m = d["h"].shape[1]
    nz = (N + 1) * nx + N * nu
    nslack = 2 * (N + 1) * m if with_soft else 0

    def xs(z, k):
        return z[k * nx:(k + 1) * nx]

    def us(z, k):
        return z[(N + 1) * nx + k * nu:(N + 1) * nx + (k + 1) * nu]

    def slacks(z, k):
        base = nz + 2 * k * m
        return z[base: base + m], z[base + m: base + 2 * m]

    def fun(z):
        val = 0.0
        for k in range(N + 1):
            x = xs(z, k)
            val += 0.5 * x @ d["Q"][k] @ x + d["q"][k] @ x
        for k in range(N):
            u = us(z, k)
            val += 0.5 * u @ d["R"][k] @ u + d["r"][k] @ u
        if with_soft:
            for k in range(N + 1):
                sl, su = slacks(z, k)
                val += np.sum(d["zl"][k] * sl * d["soft"][k]
                              + 0.5 * d["Zl"][k] * sl ** 2 * d["soft"][k])
                val += np.sum(d["zu"][k] * su * d["soft"][k]
                              + 0.5 * d["Zu"][k] * su ** 2 * d["soft"][k])
        return val

    # equality constraints: x0 pin + dynamics
    Aeq = np.zeros(((N + 1) * nx, nz + nslack))
    beq = np.zeros((N + 1) * nx)
    Aeq[:nx, :nx] = np.eye(nx)
    beq[:nx] = d["dx0"]
    for k in range(N):
        rows = slice((k + 1) * nx, (k + 2) * nx)
        Aeq[rows, (k + 1) * nx:(k + 2) * nx] = -np.eye(nx)
        Aeq[rows, k * nx:(k + 1) * nx] = d["A"]
        Aeq[rows, (N + 1) * nx + k * nu:(N + 1) * nx + (k + 1) * nu] = d["B"]
        beq[rows] = -d["c"][k]
    cons = [LinearConstraint(Aeq, beq, beq)]

    if with_ineq:
        rows_G, rows_lo, rows_up = [], [], []
        for k in range(N + 1):
            for i in range(m):
                if d["active"][k, i] == 0:
                    continue
                g = np.zeros(nz + nslack)
                g[k * nx:(k + 1) * nx] = d["Cx"][k, i]
                if k < N:
                    g[(N + 1) * nx + k * nu:(N + 1) * nx + (k + 1) * nu] = d["Cu"][k, i]
                if with_soft and d["soft"][k, i] > 0:
                    g[nz + 2 * k * m + i] = 1.0          # + sl
                    g[nz + 2 * k * m + m + i] = -1.0     # - su
                rows_G.append(g)
                rows_lo.append(d["lo"][k, i] - d["h"][k, i])
                rows_up.append(d["up"][k, i] - d["h"][k, i])
        cons.append(LinearConstraint(np.array(rows_G), np.array(rows_lo),
                                     np.array(rows_up)))
    if with_soft:
        S = np.zeros((nslack, nz + nslack))
        S[:, nz:] = np.eye(nslack)
        cons.append(LinearConstraint(S, np.zeros(nslack), np.full(nslack, np.inf)))

    res = minimize(fun, np.zeros(nz + nslack), jac=lambda z: _grad(fun, z),
                   method="trust-constr", constraints=cons,
                   options={"gtol": 1e-12, "xtol": 1e-14, "maxiter": 3000})
    z = res.x
    dx = np.stack([xs(z, k) for k in range(N + 1)])
    du = np.stack([us(z, k) for k in range(N)])
    return dx, du, res


def _grad(fun, z, eps=1e-7):
    g = np.zeros_like(z)
    f0 = fun(z)
    for i in range(len(z)):
        zp = z.copy()
        zp[i] += eps
        g[i] = (fun(zp) - f0) / eps
    return g


def test_riccati_equality_only():
    # No inequalities: the IP solve must match the dense KKT solution.
    data = make_data(0, seed_active=False)
    sol = solve_qp(data, iters=12)
    dx_ref, du_ref, _ = dense_solve(data, with_ineq=False)
    np.testing.assert_allclose(np.asarray(sol.dx), dx_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol.du), du_ref, atol=1e-6)
    assert int(sol.status) == 0
    # dynamics satisfied
    dxs = np.asarray(sol.dx)
    dus = np.asarray(sol.du)
    A, B, c = np.asarray(data.A), np.asarray(data.B), np.asarray(data.c)
    for k in range(du_ref.shape[0]):
        np.testing.assert_allclose(dxs[k + 1], A @ dxs[k] + B @ dus[k] + c[k],
                                   atol=1e-8)


def test_hard_inequalities_vs_scipy():
    data = make_data(1)
    sol = solve_qp(data, iters=30)
    dx_ref, du_ref, res = dense_solve(data, with_ineq=True)
    assert int(sol.status) == 0
    np.testing.assert_allclose(np.asarray(sol.dx), dx_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sol.du), du_ref, atol=2e-4)


def _row_values(data, dx, du):
    return (np.einsum("kmi,ki->km", np.asarray(data.Cx), np.asarray(dx))
            + np.einsum("kmi,ki->km",
                        np.concatenate([np.asarray(data.Cu),
                                        np.zeros_like(np.asarray(data.Cu[:1]))]),
                        np.concatenate([np.asarray(du),
                                        np.zeros_like(np.asarray(du[:1]))]))
            + np.asarray(data.h))


def test_active_constraints_bind():
    # Place upper bounds just inside the unconstrained optimum's row values
    # -> those rows must go active, and the problem is certifiably feasible
    # (the unconstrained solution is 0.02 away from every moved bound).
    base = make_data(2, seed_active=False)
    sol_eq = solve_qp(base, iters=12)
    rowv_eq = _row_values(base, sol_eq.dx, sol_eq.du)
    up = rowv_eq + 10.0
    up[1:, 0] = rowv_eq[1:, 0] - 0.02   # push first row down at nodes >= 1
    lo = rowv_eq - 10.0
    data = QPData(**{**{k: getattr(base, k) for k in base.__dataclass_fields__},
                     "lo": jnp.asarray(lo), "up": jnp.asarray(up),
                     "active": jnp.ones_like(base.active)})
    sol = solve_qp(data, iters=40)
    assert int(sol.status) == 0
    rowv = _row_values(data, sol.dx, sol.du)
    assert np.all(rowv <= up + 1e-5) and np.all(rowv >= lo - 1e-5)
    # the pushed rows must actually bind (within IP tolerance)
    gap = up[1:, 0] - rowv[1:, 0]
    assert gap.min() > -1e-5 and gap.max() < 2e-2
    # and match scipy on the same data
    dx_ref, du_ref, res = dense_solve(data, with_ineq=True)
    np.testing.assert_allclose(np.asarray(sol.dx), dx_ref, atol=5e-4)


def test_soft_constraints_vs_scipy():
    data = make_data(3, soft_rows=2)
    # make bounds tight so soft rows actually engage their slacks
    data = QPData(**{**{k: getattr(data, k) for k in data.__dataclass_fields__},
                     "lo": jnp.full_like(data.lo, -0.02),
                     "up": jnp.full_like(data.up, 0.02)})
    sol = solve_qp(data, iters=40)
    dx_ref, du_ref, res = dense_solve(data, with_ineq=True, with_soft=True)
    assert int(sol.status) == 0
    np.testing.assert_allclose(np.asarray(sol.dx), dx_ref, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sol.du), du_ref, atol=5e-4)
    assert np.asarray(sol.sl).max() > 1e-6 or np.asarray(sol.su).max() > 1e-6


def test_infeasible_detected():
    data = make_data(4)
    # contradictory hard bounds on x0-pinned rows -> infeasible
    lo = np.asarray(data.lo).copy()
    up = np.asarray(data.up).copy()
    lo[:, 0] = 10.0
    up[:, 0] = 11.0
    Cx = np.asarray(data.Cx).copy()
    Cx[:, 0, :] = 0.0  # row value is constant h, far outside [10, 11]
    Cu = np.asarray(data.Cu).copy()
    Cu[:, 0, :] = 0.0
    data = QPData(**{**{k: getattr(data, k) for k in data.__dataclass_fields__},
                     "lo": jnp.asarray(lo), "up": jnp.asarray(up),
                     "Cx": jnp.asarray(Cx), "Cu": jnp.asarray(Cu)})
    sol = solve_qp(data, iters=25)
    assert int(sol.status) == 4


def test_batched_vmap():
    datas = [make_data(s) for s in range(5, 9)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    sols = jax.vmap(lambda d: solve_qp(d, iters=25))(batched)
    for i, d in enumerate(datas):
        single = solve_qp(d, iters=25)
        np.testing.assert_allclose(np.asarray(sols.dx[i]),
                                   np.asarray(single.dx), atol=1e-8)
