"""Horizon-parallel (associative-scan) Riccati LQR solver.

The backward Riccati recursion and the forward rollout in
``qp._riccati_solve`` are sequential in the horizon: at N=45 that is 45
dependent steps each way, which dominates small-batch per-tick LATENCY
(the reference's 5 ms real-time budget, config.yaml:7) even though the
per-step math is tiny. Both recursions are compositions of ASSOCIATIVE
operators, so they parallelize to O(log N) depth with
``jax.lax.associative_scan`` (the temporal-parallelization construction
of Särkkä & García-Fernández for LQT, re-derived here for the
cross-term/affine OCP-QP form used by the IP solver).

Element calculus. A span k→j (controls minimized out) is represented by
(A, b, C, eta, J) encoding

    V(x, z) = 1/2 (z - A x - b)' C⁻¹ (z - A x - b)        [generalized]
            + 1/2 x' J x - eta' x,

where x = dx_k, z = dx_j. Composition of e1 (k→i) with e2 (i→j),
writing D = (I + C1 J2)⁻¹ (the only linear solve; E = (I + J2 C1)⁻¹ =
D' by symmetry of C1, J2):

    A = A2 D A1
    b = A2 D (b1 + C1 eta2) + b2
    C = A2 D C1 A2' + C2
    eta = eta1 + (D A1)' (eta2 - J2 b1)
    J = J1 + (D A1)' J2 A1

One-step init from the stage data (cost 1/2 x'Q x + q'x + 1/2 u'R u
+ r'u + x'S u, dynamics z = A x + B u + c) by completing the square in
u (u* = -R⁻¹(r + S'x)):

    A_e = A - B R⁻¹ S',  b_e = c - B R⁻¹ r,  C_e = B R⁻¹ B',
    J_e = Q - S R⁻¹ S',  eta_e = -(q - S R⁻¹ r),

plus a terminal element (0, 0, 0, -q_N, Q_N). The reverse suffix scan
then yields the cost-to-go at every node: P_k = J_k, p_k = -eta_k, from
which gains are recovered node-parallel, and the forward rollout
dx_{k+1} = (A + B K_k) dx_k + (B kff_k + c_k) is a second associative
scan over affine maps (M, v) ∘ (M', v') = (M M', M v' + v).

Numerically pinned against ``qp._riccati_solve`` (tests/test_riccati_
assoc.py). Same signature/layout as `_riccati_solve`; vmap for batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(e1, e2):
    """Compose span elements: e1 = earlier span (k→i), e2 = later (i→j)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    n = A1.shape[-1]
    I = jnp.eye(n, dtype=A1.dtype)
    mv = lambda M_, v_: jnp.einsum("...ij,...j->...i", M_, v_)
    M = I + C1 @ J2                                     # (.., n, n)
    # one factorization, three solves: D A1, D C1, D (b1 + C1 eta2)
    rhs = jnp.concatenate(
        [A1, C1, (b1 + mv(C1, eta2))[..., None]], axis=-1)
    sol = jnp.linalg.solve(M, rhs)
    DA1 = sol[..., :n]
    DC1 = sol[..., n:2 * n]
    Db = sol[..., -1]
    A = A2 @ DA1
    b = mv(A2, Db) + b2
    C = A2 @ DC1 @ jnp.swapaxes(A2, -1, -2) + C2
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    eta = eta1 + jnp.einsum("...ji,...j->...i", DA1, eta2 - mv(J2, b1))
    J = J1 + jnp.swapaxes(DA1, -1, -2) @ (J2 @ A1)
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return (A, b, C, eta, J)


def riccati_assoc(A, B, c, dx0, Qb, qb, Rb, rb, Sb):
    """LQR with cross terms, horizon-parallel. Same contract as
    ``qp._riccati_solve``: Qb (N+1,nx,nx), qb (N+1,nx), Rb (N,nu,nu),
    rb (N,nu), Sb (N,nx,nu); returns (dx (N+1,nx), du (N,nu))."""
    N, nx = c.shape
    nu = B.shape[1]
    dtype = A.dtype
    eps = 1e-5 if dtype == jnp.float32 else 0.0

    # ---- one-step elements (node-parallel)
    def init_elem(Qk, qk, Rk, rk, Sk, ck):
        L = jnp.linalg.cholesky(Rk)
        Ri_St_r = jax.scipy.linalg.cho_solve(
            (L, True), jnp.concatenate([Sk.T, rk[:, None]], axis=1))
        Ri_St = Ri_St_r[:, :nx]                     # R⁻¹ S'
        Ri_r = Ri_St_r[:, nx]                       # R⁻¹ r
        Ri_Bt = jax.scipy.linalg.cho_solve((L, True), B.T)
        A_e = A - B @ Ri_St
        b_e = ck - B @ Ri_r
        C_e = B @ Ri_Bt                             # B R⁻¹ B'
        J_e = Qk - Sk @ Ri_St
        eta_e = -(qk - Sk @ Ri_r)
        return (A_e, b_e, 0.5 * (C_e + C_e.T), eta_e,
                0.5 * (J_e + J_e.T))

    elems = jax.vmap(init_elem)(Qb[:N], qb[:N], Rb, rb, Sb, c)
    term = (jnp.zeros((1, nx, nx), dtype), jnp.zeros((1, nx), dtype),
            jnp.zeros((1, nx, nx), dtype), -qb[N][None], Qb[N][None])
    elems = jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term)

    # ---- suffix scan: out[k] = e_k ⊗ ... ⊗ e_N  →  (P_k, p_k).
    # associative_scan(reverse=True) passes the LATER partial product as
    # the first fn argument, so swap into _combine's (earlier, later).
    out = jax.lax.associative_scan(lambda a, b: _combine(b, a),
                                   elems, reverse=True)
    P = out[4]                                      # (N+1, nx, nx)
    p = -out[3]                                     # (N+1, nx)

    # ---- gains, node-parallel (same algebra as the sequential sweep)
    def gains(Pn, pn, Rk, rk, Sk, ck):
        PB = Pn @ B
        Huu = Rk + B.T @ PB
        if eps:
            Huu = Huu + (eps * jnp.max(jnp.diagonal(Huu))) \
                * jnp.eye(nu, dtype=dtype)
        Hux = Sk.T + B.T @ (Pn @ A)
        hu = rk + B.T @ (Pn @ ck + pn)
        L = jnp.linalg.cholesky(Huu)
        sol = jax.scipy.linalg.cho_solve(
            (L, True), jnp.concatenate([Hux, hu[:, None]], axis=1))
        return -sol[:, :nx], -sol[:, nx]

    Ks, kffs = jax.vmap(gains)(P[1:], p[1:], Rb, rb, Sb, c)

    # ---- forward rollout as an associative scan over affine maps
    Ms = A + B @ Ks                                 # (N, nx, nx) closed loop
    vs = jnp.einsum("ij,kj->ki", B, kffs) + c
    Mv = jax.lax.associative_scan(
        lambda f, g: (g[0] @ f[0],
                      jnp.einsum("kij,kj->ki", g[0], f[1]) + g[1]),
        (Ms, vs))
    dx_tail = jnp.einsum("kij,j->ki", Mv[0], dx0) + Mv[1]
    dx = jnp.concatenate([dx0[None], dx_tail], axis=0)
    du = jnp.einsum("kij,kj->ki", Ks, dx[:N]) + kffs
    return dx, du
