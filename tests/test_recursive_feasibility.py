"""The framework's core safety property (SURVEY.md §4): states certified
by the trained safe set admit feasible braking trajectories — i.e. the
abort mechanism the controllers fall back on actually exists from states
the terminal constraint admits."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import REPO_ROOT, load_config
from safe_mpc_tpu.controllers.base import SafeBackupController
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.models.safeset import NetSafeSet
from safe_mpc_tpu.tasks.sampling import sample_initial_states
from safe_mpc_tpu.tasks.train_safeset import _braking_feasible

CKPT = os.path.join(REPO_ROOT, "nn_models", "z1", "z1_safe_set.pt")


@pytest.mark.skipif(not os.path.isfile(CKPT),
                    reason="trained safe-set checkpoint not present")
def test_net_certified_states_admit_braking():
    cfg = load_config().with_(back_hor=30, alpha=10.0)
    model = ManipulatorModel(cfg)
    net = NetSafeSet(model, checkpoint=CKPT)
    backup = SafeBackupController(model, N=30, qp_iters=15)

    # sample rest configurations, give them velocities at 60% of the
    # net-predicted safe envelope (comfortably inside the alpha=10 margin)
    n = 12
    x0s = sample_initial_states(model, n)
    key = jax.random.PRNGKey(3)
    dirs = jax.random.normal(key, (n, model.nq), x0s.dtype)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)

    def certified_state(x0, d):
        out, _ = net.raw_net(x0.at[model.nq:].set(1e-3 * d))
        s = 0.6 * jnp.maximum(out, 0.0)
        dq_max = jnp.asarray(model.x_max[model.nq:], x0.dtype)
        cap = jnp.min(dq_max / jnp.maximum(jnp.abs(d), 1e-9))
        s = jnp.minimum(s, 0.9 * cap)
        return x0.at[model.nq:].set(s * d)

    xs = jax.vmap(certified_state)(x0s, dirs)
    inside = jax.vmap(lambda x: net.check(x))(xs)
    feas = jax.jit(jax.vmap(
        lambda x: _braking_feasible(backup, x, max_iters=25)))(xs)

    inside = np.asarray(inside)
    feas = np.asarray(feas)
    # the property: certified ==> brakeable. Allow a small slack for net
    # regression error (the net is a regression of the envelope, not a
    # verified certificate).
    assert inside.sum() >= n * 0.7, f"net rejected too many: {inside}"
    ok = feas[inside]
    # boundary-focused retrained checkpoint measures 1.00 at n=96
    # (scripts_dev/diag_safeset_quality.py); assert the VERDICT target
    assert ok.mean() >= 0.99, (
        f"recursive feasibility violated: {ok.sum()}/{len(ok)} certified "
        f"states brakeable")
