"""Pallas TPU kernel: batch-tile Riccati LQR sweep.

The "many problems per tile" design (SURVEY.md §7): a grid over batch
tiles of `TILE` problems, each kernel instance holding its tile's entire
stage data in VMEM and running the backward recursion + forward rollout
with the batch in the lane dimension. Compared to the XLA scan, the whole
sweep lives in VMEM (no per-stage HBM round-trips) and every small-matrix
op is an unrolled (TILE,)-wide VPU expression.

Used by `solve_qp_batched(..., riccati='pallas')`; numerically pinned
against `_riccati_last` in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _chol_last(M):
    n = M.shape[0]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros_like(M[0, 0])
                       for j in range(n)]) for i in range(n)]
    return jnp.stack(rows)


def _chol_solve_last(L, rhs):
    n = rhs.shape[0]
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i, k][None] * y[k]
        y[i] = s / L[i, i][None]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k, i][None] * x[k]
        x[i] = s / L[i, i][None]
    return jnp.stack(x)


def _riccati_kernel(A_ref, B_ref, c_ref, dx0_ref, Q_ref, q_ref, R_ref,
                    r_ref, S_ref, dx_ref, du_ref, K_scr, k_scr, eps: float,
                    N: int):
    A = A_ref[:]                       # (nx, nx)
    Bm = B_ref[:]                      # (nx, nu)
    nx, nu = Bm.shape

    P = Q_ref[N]                       # (nx, nx, TILE)
    p = q_ref[N]                       # (nx, TILE)

    def backward(t, carry):
        P, p = carry
        k = N - 1 - t
        Qk = Q_ref[k]
        qk = q_ref[k]
        Rk = R_ref[k]
        rk = r_ref[k]
        Sk = S_ref[k]
        ck = c_ref[k]
        PA = jnp.einsum("ijb,jk->ikb", P, A)
        PB = jnp.einsum("ijb,jk->ikb", P, Bm)
        Huu = Rk + jnp.einsum("ji,jkb->ikb", Bm, PB)
        if eps:
            # diagonal via mask-reduce: 3-D gather doesn't lower on TPU
            diag = jnp.sum(
                Huu * jnp.eye(nu, dtype=Huu.dtype)[:, :, None], axis=0)
            dmax = jnp.max(diag, axis=0)
            Huu = Huu + (eps * dmax)[None, None] \
                * jnp.eye(nu, dtype=Huu.dtype)[:, :, None]
        Hux = jnp.einsum("jib->ijb", Sk) + jnp.einsum("ji,jkb->ikb", Bm, PA)
        Pc_p = jnp.einsum("ijb,jb->ib", P, ck) + p
        hu = rk + jnp.einsum("ji,jb->ib", Bm, Pc_p)
        L = _chol_last(Huu)
        sol = _chol_solve_last(L, jnp.concatenate([Hux, hu[:, None]], axis=1))
        K = -sol[:, :-1]
        kff = -sol[:, -1]
        K_scr[k] = K
        k_scr[k] = kff
        Pk = Qk + jnp.einsum("ji,jkb->ikb", A, PA) \
            + jnp.einsum("jib,jkb->ikb", Hux, K)
        Pk = 0.5 * (Pk + jnp.einsum("ijb->jib", Pk))
        pk = qk + jnp.einsum("ji,jb->ib", A, Pc_p) \
            + jnp.einsum("jib,jb->ib", Hux, kff)
        return (Pk, pk)

    P, p = jax.lax.fori_loop(0, N, backward, (P, p))

    dx_ref[0] = dx0_ref[:]

    def forward(k, dx):
        K = K_scr[k]
        kff = k_scr[k]
        du = jnp.einsum("ijb,jb->ib", K, dx) + kff
        du_ref[k] = du
        dx_next = jnp.einsum("ij,jb->ib", A, dx) \
            + jnp.einsum("ij,jb->ib", Bm, du) + c_ref[k]
        dx_ref[k + 1] = dx_next
        return dx_next

    jax.lax.fori_loop(0, N, forward, dx_ref[0], unroll=False)


def riccati_pallas(A, B, c, dx0, Qb, qb, Rb, rb, Sb, *, interpret=False):
    """Batch-last Riccati via one Pallas kernel per batch tile.

    Shapes as `_riccati_last`: c (N, nx, Bt), Qb (N+1, nx, nx, Bt), ...;
    Bt must be a multiple of TILE (pad at the call site).
    """
    N, nx, Bt = c.shape
    nu = B.shape[1]
    assert Bt % TILE == 0, f"batch {Bt} not a multiple of {TILE}"
    grid = (Bt // TILE,)
    dtype = c.dtype
    eps = 1e-5 if dtype == jnp.float32 else 0.0

    def tile_spec(*lead):
        rank = len(lead)
        return pl.BlockSpec(lead + (TILE,),
                            lambda i, _r=rank: (0,) * _r + (i,),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_riccati_kernel, eps=eps, N=N)
    dx, du = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # A
            pl.BlockSpec(memory_space=pltpu.VMEM),        # B
            tile_spec(N, nx),                             # c
            tile_spec(nx),                                # dx0
            tile_spec(N + 1, nx, nx),                     # Q
            tile_spec(N + 1, nx),                         # q
            tile_spec(N, nu, nu),                         # R
            tile_spec(N, nu),                             # r
            tile_spec(N, nx, nu),                         # S
        ],
        out_specs=(tile_spec(N + 1, nx), tile_spec(N, nu)),
        out_shape=(jax.ShapeDtypeStruct((N + 1, nx, Bt), dtype),
                   jax.ShapeDtypeStruct((N, nu, Bt), dtype)),
        scratch_shapes=[
            pltpu.VMEM((N, nu, nx, TILE), dtype),
            pltpu.VMEM((N, nu, TILE), dtype),
        ],
        interpret=interpret,
    )(A, B, c, dx0, Qb, qb, Rb, rb, Sb)
    return dx, du
