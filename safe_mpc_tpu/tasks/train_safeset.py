"""Control-invariant safe-set learning: label generation + MLP training.

The reference consumes externally-trained networks (README.md:5 — a
Google Drive download; no training code ships with it). This module makes
the framework self-contained: it learns the same quantity the reference's
nets encode — for a configuration/velocity-direction pair, the **maximum
safe velocity norm** ``s*(q, v_dir)`` from which the arm can still brake
to zero velocity without violating joint bounds, torque limits or
collision constraints (the recursive-feasibility certificate).

Label generation is the TPU-shaped part: ``s*`` is found by bisection
where every bisection step is ONE batched SafeBackup SQP solve over all
samples simultaneously — the workload the reference would need hours of
serial acados solves for.

The trained net drops into :class:`NetSafeSet` unchanged (same
architecture, same input encoding ``[(q - mean)/std, v_dir]``, same
``NN * (100 - alpha)/100 - |v|`` constraint), and can be exported as a
reference-format torch checkpoint.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..controllers.base import SafeBackupController
from ..models.manipulator import ManipulatorModel
from ..models.safeset import ACTIVATIONS, MlpParams, mlp_forward, random_mlp
from .sampling import sample_initial_states


def _braking_feasible(backup: SafeBackupController, x, max_iters: int = 25):
    """True if a feasible braking trajectory exists from state x.

    Tolerances are dtype-aware: the reference check tolerances (tol_tau
    1e-6) assume f64; on the f32 TPU path the QP resolves constraints to
    ~1e-4, so the feasibility band widens accordingly."""
    model = backup.model
    res = backup.solve_backup(x, max_iters=max_iters)
    xs, us = res.xs, res.us
    taus = jax.vmap(model.tau)(xs[:-1], us)
    tol = 1e-3 if x.dtype == jnp.float32 else model.cfg.tol_tau
    tau_lo = jnp.asarray(model.tau_min, x.dtype) - tol
    tau_hi = jnp.asarray(model.tau_max, x.dtype) + tol
    ok = res.status == 0
    ok = jnp.logical_and(ok, jnp.all(jax.vmap(model.check_state_bounds)(xs)))
    ok = jnp.logical_and(ok, jnp.all((taus >= tau_lo) & (taus <= tau_hi)))
    ok = jnp.logical_and(ok, jnp.all(jax.vmap(model.check_collision)(xs)))
    ok = jnp.logical_and(ok, jnp.all(jnp.abs(xs[-1, model.nq:]) < 2e-3))
    return ok


def boundary_focused_states(model: ManipulatorModel, n: int,
                            boundary_frac: float = 0.5, seed: int = 0,
                            pool_factor: int = 4):
    """Mix of uniform Halton states and low-margin ("boundary") states.

    The safe set's decision surface lives where braking is ABOUT to become
    infeasible — near obstacles and joint limits. Uniform sampling wastes
    most labels deep inside the safe region, so this draws a `pool_factor`
    oversized Halton pool, scores each configuration by its criticality
    margin (min over normalized collision clearance and joint-limit
    distance), and keeps the lowest-margin `boundary_frac` of the output
    from the pool plus a uniform remainder.
    """
    nq = model.nq
    n_b = int(round(boundary_frac * n))
    n_u = n - n_b
    pool = sample_initial_states(model, max(pool_factor * n_b, n_b),
                                 seed_offset=seed * 977)

    @jax.jit
    @jax.vmap
    def margins(x):
        q = x[:nq]
        lo = jnp.asarray(model.x_min[:nq], x.dtype)
        hi = jnp.asarray(model.x_max[:nq], x.dtype)
        m_joint = jnp.min(jnp.minimum(q - lo, hi - q) / (hi - lo))
        if model.n_collision:
            clo, chi = model.collision_bounds
            vals = model.collision_values(x)
            gap = jnp.minimum(vals - jnp.asarray(clo, x.dtype),
                              jnp.asarray(chi, x.dtype) - vals)
            m_col = jnp.min(gap)  # meters of clearance
        else:
            m_col = jnp.inf
        return m_joint, m_col

    # split the boundary quota between the two criticality types —
    # joint-limit proximity dominates a min() score in a Halton pool,
    # starving the obstacle boundary of labels
    m_joint, m_col = (np.asarray(a) for a in margins(pool))
    n_col = n_b // 2
    idx_col = np.argsort(m_col)[:n_col]
    rest = np.setdiff1d(np.arange(pool.shape[0]), idx_col)
    idx_j = rest[np.argsort(m_joint[rest])[:n_b - n_col]]
    uni = sample_initial_states(model, n_u,
                                seed_offset=seed * 977 + 131071)
    return jnp.concatenate([pool[idx_col], pool[idx_j], uni], axis=0)


def generate_labels(model: ManipulatorModel, n_samples: int,
                    backup_N: int | None = None, bisection_iters: int = 7,
                    seed: int = 0, qp_iters: int = 15, sqp_iters: int = 20,
                    v_cap: float | None = None, chunk: int = 256,
                    boundary_frac: float = 0.0, verbose: bool = False):
    """(states (n, nx_dirs...), labels s* (n,)).

    Returns (q (n, nq), v_dir (n, nq), s_star (n,)). Each bisection
    iteration solves `n_samples` braking OCPs batched; samples are
    processed in host-level chunks of `chunk` to cap live HBM (the
    braking SQP holds ~20 MB of intermediates per problem).
    `boundary_frac` > 0 biases that fraction of the samples toward the
    constraint boundary (`boundary_focused_states`).
    """
    nq = model.nq
    backup = SafeBackupController(model, N=backup_N or model.cfg.back_hor,
                                  qp_iters=qp_iters)
    if boundary_frac > 0:
        x0s = boundary_focused_states(model, n_samples,
                                      boundary_frac=boundary_frac,
                                      seed=seed)
    else:
        x0s = sample_initial_states(model, n_samples, seed_offset=seed * 977)
    qs = x0s[:, :nq]
    key = jax.random.PRNGKey(seed)
    dirs = jax.random.normal(key, (n_samples, nq), x0s.dtype)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    # per-sample cap: the largest s with q-velocity still inside the box
    dq_max = jnp.asarray(model.x_max[nq:], x0s.dtype)
    cap = jnp.min(dq_max / jnp.maximum(jnp.abs(dirs), 1e-9), axis=1)
    if v_cap is not None:
        cap = jnp.minimum(cap, v_cap)

    feas_chunk = jax.jit(jax.vmap(
        lambda q, d, s: _braking_feasible(
            backup, jnp.concatenate([q, s * d]), max_iters=sqp_iters)))

    def feas(qs_, dirs_, ss_):
        outs = []
        for a in range(0, qs_.shape[0], chunk):
            b = min(a + chunk, qs_.shape[0])
            outs.append(feas_chunk(qs_[a:b], dirs_[a:b], ss_[a:b]))
            if verbose and a == 0:
                # force the first chunk through (compile happens here);
                # a silent multi-minute stall means the backend, not
                # the math
                outs[0].block_until_ready()
                print(f"    first chunk ({b} samples) done", flush=True)
        return jnp.concatenate(outs)

    lo = jnp.zeros(n_samples, x0s.dtype)
    hi = cap
    # seed: check feasibility at the cap (if feasible, s* = cap)
    import time as _time
    t0 = _time.time()
    ok_hi = feas(qs, dirs, hi)
    if verbose:
        jax.block_until_ready(ok_hi)
        print(f"  bisection seed pass: {_time.time() - t0:.1f}s",
              flush=True)
    for it in range(bisection_iters):
        mid = 0.5 * (lo + hi)
        ok = feas(qs, dirs, mid)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
        if verbose:
            jax.block_until_ready(ok)
            print(f"  bisection pass {it + 1}/{bisection_iters}: "
                  f"t={_time.time() - t0:.1f}s", flush=True)
    s_star = jnp.where(ok_hi, cap, lo)
    return np.asarray(qs), np.asarray(dirs), np.asarray(s_star)


def encode_inputs(qs, dirs, mean, std):
    return np.concatenate([(qs - mean) / std, dirs], axis=1).astype(np.float32)


def train_net(qs, dirs, labels, hidden: int = 256, epochs: int = 500,
              lr: float = 1e-3, batch_size: int = 1024, seed: int = 0,
              activation: str = "gelu", val_frac: float = 0.1):
    """Train the reference-architecture MLP on (inputs -> s*). Returns
    (MlpParams, history dict)."""
    import optax

    nq = qs.shape[1]
    mean = qs.mean(axis=0)
    std = qs.std(axis=0) + 1e-6
    X = encode_inputs(qs, dirs, mean, std)
    y = np.asarray(labels, np.float32)[:, None]

    n = X.shape[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(val_frac * n))
    Xv, yv = X[perm[:n_val]], y[perm[:n_val]]
    Xt, yt = X[perm[n_val:]], y[perm[n_val:]]

    params = random_mlp(jax.random.PRNGKey(seed), (2 * nq, hidden, 1))
    params = dataclasses.replace(
        params, mean=jnp.asarray(mean, jnp.float32),
        std=jnp.asarray(std, jnp.float32))
    act = ACTIVATIONS[activation]

    opt = optax.adam(lr)
    trainable = (params.weights, params.biases)
    opt_state = opt.init(trainable)

    def loss_fn(trainable, xb, yb):
        w, b = trainable
        p = dataclasses.replace(params, weights=w, biases=b)
        pred = mlp_forward(p, xb, act)
        return jnp.mean((pred - yb) ** 2)

    @jax.jit
    def step(trainable, opt_state, xb, yb):
        loss, g = jax.value_and_grad(loss_fn)(trainable, xb, yb)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(trainable, updates), opt_state, loss

    Xt_j, yt_j = jnp.asarray(Xt), jnp.asarray(yt)
    history = {"train": [], "val": []}
    nb = max(1, Xt.shape[0] // batch_size)
    for epoch in range(epochs):
        perm = rng.permutation(Xt.shape[0])
        ep_loss = 0.0
        for k in range(nb):
            idx = perm[k * batch_size:(k + 1) * batch_size]
            trainable, opt_state, loss = step(
                trainable, opt_state, Xt_j[idx], yt_j[idx])
            ep_loss += float(loss)
        if epoch % 25 == 0 or epoch == epochs - 1:
            vl = float(loss_fn(trainable, jnp.asarray(Xv), jnp.asarray(yv)))
            history["train"].append(ep_loss / nb)
            history["val"].append(vl)
    w, b = trainable
    return dataclasses.replace(params, weights=w, biases=b), history


def save_npz(path: str, params: MlpParams) -> None:
    np.savez(path,
             mean=np.asarray(params.mean), std=np.asarray(params.std),
             **{f"w{i}": np.asarray(w) for i, w in enumerate(params.weights)},
             **{f"b{i}": np.asarray(b) for i, b in enumerate(params.biases)})


def load_npz(path: str) -> MlpParams:
    z = np.load(path)
    n = len([k for k in z.files if k.startswith("w")])
    return MlpParams(
        weights=tuple(jnp.asarray(z[f"w{i}"]) for i in range(n)),
        biases=tuple(jnp.asarray(z[f"b{i}"]) for i in range(n)),
        mean=jnp.asarray(z["mean"]), std=jnp.asarray(z["std"]))


def export_torch_checkpoint(path: str, params: MlpParams) -> None:
    """Write a reference-format ``.pt`` (safe_set.py:76-78 keys), so the
    trained set round-trips through the torch ecosystem."""
    import torch

    state = {}
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        state[f"linear_stack.{2 * i}.weight"] = torch.from_numpy(
            np.asarray(w).copy())
        state[f"linear_stack.{2 * i}.bias"] = torch.from_numpy(
            np.asarray(b).copy())
    torch.save({"model": state,
                "mean": torch.from_numpy(np.asarray(params.mean).copy()),
                "std": torch.from_numpy(np.asarray(params.std).copy())}, path)
