"""Structured (analytic-sensitivity) transcription vs the generic
autodiff oracle: identical QPData on random states."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.models.safeset import create_safe_set
from safe_mpc_tpu.ops.transcribe import OcpSpec

N = 6


@pytest.mark.parametrize("use_net", [False, True])
def test_fast_matches_generic(use_net):
    cfg = load_config().with_(N=N, use_net=use_net)
    model = ManipulatorModel(cfg)
    sset = create_safe_set(model)
    rng = np.random.default_rng(0)
    q = rng.uniform(model.x_min[: model.nq] + 0.05,
                    model.x_max[: model.nq] - 0.05, (N + 1, model.nq))
    v = rng.uniform(-1.0, 1.0, (N + 1, model.nq))
    xg = jnp.asarray(np.concatenate([q, v], axis=1))
    ug = jnp.asarray(rng.uniform(-3.0, 3.0, (N, model.nu)))
    x0 = xg[0]

    fast = OcpSpec(model, safe_set=sset, N=N, fast=True)
    slow = OcpSpec(model, safe_set=sset, N=N, fast=False)
    sched = fast.default_schedule()
    sched = dataclasses.replace(
        sched,
        safe_active=sched.safe_active.at[:].set(1.0).at[0].set(0.0))

    df = fast.transcribe(xg, ug, x0, sched)
    ds = slow.transcribe(xg, ug, x0, sched)
    for field in df.__dataclass_fields__:
        a, b = np.asarray(getattr(df, field)), np.asarray(getattr(ds, field))
        np.testing.assert_allclose(
            a, b, atol=5e-9, rtol=1e-7,
            err_msg=f"field {field} differs (use_net={use_net})")


def test_fast_matches_generic_backup_cost():
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    fast = OcpSpec(model, N=N, fast=True, vel_penalty=1e4, lm=0.0)
    slow = OcpSpec(model, N=N, fast=False, vel_penalty=1e4, lm=0.0)
    rng = np.random.default_rng(1)
    xg = jnp.asarray(np.concatenate(
        [rng.uniform(model.x_min[: model.nq] + 0.1,
                     model.x_max[: model.nq] - 0.1, (N + 1, model.nq)),
         rng.uniform(-0.5, 0.5, (N + 1, model.nq))], axis=1))
    ug = jnp.asarray(rng.uniform(-1.0, 1.0, (N, model.nu)))
    sched = fast.default_schedule()
    df = fast.transcribe(xg, ug, xg[0], sched)
    ds = slow.transcribe(xg, ug, xg[0], sched)
    for field in ("h", "Cx", "Cu", "Q", "q", "R", "r"):
        np.testing.assert_allclose(
            np.asarray(getattr(df, field)), np.asarray(getattr(ds, field)),
            atol=5e-9, rtol=1e-7, err_msg=field)
