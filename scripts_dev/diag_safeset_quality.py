"""Quantify safe-set quality: recursive-feasibility pass rate of the
CURRENT checkpoint at scale (n=96 certified states at 60% envelope),
plus label-regression stats. Run on CPU (f64 braking oracle).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "apps"))

from _common import setup_runtime


def main():
    backend, dtype = setup_runtime(force_cpu=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.config import REPO_ROOT, load_config
    from safe_mpc_tpu.controllers.base import SafeBackupController
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.models.safeset import NetSafeSet
    from safe_mpc_tpu.tasks.sampling import sample_initial_states
    from safe_mpc_tpu.tasks.train_safeset import _braking_feasible

    cfg = load_config().with_(back_hor=30, alpha=10.0)
    model = ManipulatorModel(cfg)
    ckpt = os.path.join(REPO_ROOT, "nn_models", "z1", "z1_safe_set.pt")
    net = NetSafeSet(model, checkpoint=ckpt)
    backup = SafeBackupController(model, N=30, qp_iters=15)

    n = int(os.environ.get("RF_N", "96"))
    frac = float(os.environ.get("RF_FRAC", "0.6"))
    x0s = sample_initial_states(model, n)
    key = jax.random.PRNGKey(7)
    dirs = jax.random.normal(key, (n, model.nq), x0s.dtype)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)

    def certified_state(x0, d):
        out, _ = net.raw_net(x0.at[model.nq:].set(1e-3 * d))
        s = frac * jnp.maximum(out, 0.0)
        dq_max = jnp.asarray(model.x_max[model.nq:], x0.dtype)
        cap = jnp.min(dq_max / jnp.maximum(jnp.abs(d), 1e-9))
        return x0.at[model.nq:].set(jnp.minimum(s, 0.9 * cap) * d)

    xs = jax.vmap(certified_state)(x0s, dirs)
    inside = np.asarray(jax.vmap(lambda x: net.check(x))(xs))
    feas = []
    CH = 24
    fcheck = jax.jit(jax.vmap(
        lambda x: _braking_feasible(backup, x, max_iters=25)))
    for a in range(0, n, CH):
        feas.append(np.asarray(fcheck(xs[a:a + CH])))
    feas = np.concatenate(feas)
    ok = feas[inside]
    print(f"certified inside: {inside.sum()}/{n}; "
          f"recursive-feasibility pass rate at {frac:.0%} envelope: "
          f"{ok.mean():.4f} ({ok.sum()}/{len(ok)})", flush=True)


if __name__ == "__main__":
    main()
