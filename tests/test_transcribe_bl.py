"""Batch-last transcription / merit evaluation vs the per-problem path.

`OcpSpec.transcribe_bl` must produce the same QP as `vmap(transcribe)`
(fast=True) field-for-field, including per-problem schedules; and
`merit_terms_bl` must reproduce `total_cost` + `constraint_violation_l1`.
These equivalences license the simulator's lane-packed hot path
(`rti_step_batched` / `sqp_solve_batched`).
"""

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
B = 3


def _problems(model, rng, use_traj=False):
    q = rng.uniform(model.x_min[: model.nq] + 0.05,
                    model.x_max[: model.nq] - 0.05, (B, N + 1, model.nq))
    v = rng.uniform(-1.0, 1.0, (B, N + 1, model.nq))
    xg = jnp.asarray(np.concatenate([q, v], axis=2))
    ug = jnp.asarray(rng.uniform(-3.0, 3.0, (B, N, model.nu)))
    return xg, ug, xg[:, 0]


def _batched_schedules(spec, rng):
    """Per-problem schedules with diverging activation/soft/ref fields."""
    base = spec.default_schedule()

    def one(i):
        sa = jnp.zeros(N + 1).at[N - i].set(1.0).at[N].set(1.0)
        ss = jnp.zeros(N + 1).at[N].set(float(i % 2))
        return dataclasses.replace(
            base,
            p_ee=base.p_ee + 0.01 * i,
            safe_active=sa, safe_soft=ss,
            safe_zl=jnp.full(N + 1, 1e4 * (i + 1.0)),
            safe_zu=jnp.full(N + 1, 1e4 * (i + 1.0)),
            # per-problem LM scaling (the near-target LM drop)
            lm_scale=jnp.asarray(1.0 if i % 2 else 0.05))

    return jax.tree.map(lambda *ls: jnp.stack(ls), *[one(i) for i in range(B)])


@pytest.mark.parametrize("use_net", [False, True])
def test_transcribe_bl_matches_vmapped(use_net):
    cfg = load_config().with_(N=N, use_net=use_net)
    model = ManipulatorModel(cfg)
    sset = create_safe_set(model)
    spec = OcpSpec(model, safe_set=sset, N=N, fast=True)
    rng = np.random.default_rng(0)
    xg, ug, x0 = _problems(model, rng)
    scheds = _batched_schedules(spec, rng)

    ref = jax.vmap(lambda x, u, x0_, s: spec.transcribe(x, u, x0_, s))(
        xg, ug, x0, scheds)                                  # batch-leading
    bl = spec.transcribe_bl(xg, ug, x0, scheds)              # batch-last

    for field in bl.__dataclass_fields__:
        a = np.asarray(getattr(bl, field))
        b = np.asarray(getattr(ref, field))
        if field in ("A", "B"):
            b = b[0]                     # shared across the batch by design
        else:
            a = np.moveaxis(a, -1, 0)    # lane axis -> leading batch
        np.testing.assert_allclose(
            a, b, atol=2e-8, rtol=1e-6,
            err_msg=f"field {field} differs (use_net={use_net})")


def test_transcribe_bl_shared_schedule_broadcasts():
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    sset = create_safe_set(model)
    spec = OcpSpec(model, safe_set=sset, N=N, fast=True)
    rng = np.random.default_rng(1)
    xg, ug, x0 = _problems(model, rng)
    sched = spec.default_schedule()
    sched = dataclasses.replace(
        sched, safe_active=sched.safe_active.at[N].set(1.0))

    bl = spec.transcribe_bl(xg, ug, x0, sched)               # unbatched sched
    ref = jax.vmap(lambda x, u, x0_: spec.transcribe(x, u, x0_, sched))(
        xg, ug, x0)
    np.testing.assert_allclose(np.moveaxis(np.asarray(bl.h), -1, 0),
                               np.asarray(ref.h), atol=2e-8, rtol=1e-6)
    np.testing.assert_allclose(np.moveaxis(np.asarray(bl.Cx), -1, 0),
                               np.asarray(ref.Cx), atol=2e-8, rtol=1e-6)


@pytest.mark.parametrize("use_net", [False, True])
def test_merit_terms_bl_matches_per_problem(use_net):
    cfg = load_config().with_(N=N, use_net=use_net)
    model = ManipulatorModel(cfg)
    sset = create_safe_set(model)
    spec = OcpSpec(model, safe_set=sset, N=N, fast=True)
    rng = np.random.default_rng(2)
    xg, ug, _ = _problems(model, rng)
    scheds = _batched_schedules(spec, rng)

    cost, hard, soft_pen, dyn = spec.merit_terms_bl(xg, ug, scheds)

    for i in range(B):
        sched_i = jax.tree.map(lambda a: a[i], scheds)
        data_i = spec.transcribe(xg[i], ug[i], xg[i, 0], sched_i)
        c_ref = spec.total_cost(xg[i], ug[i], sched_i.p_ee)
        h_ref, s_ref, d_ref = spec.constraint_violation_l1(
            data_i, xg[i], ug[i], sched_i)
        np.testing.assert_allclose(float(cost[i]), float(c_ref),
                                   rtol=1e-9, atol=1e-10, err_msg="cost")
        np.testing.assert_allclose(float(hard[i]), float(h_ref),
                                   rtol=1e-7, atol=1e-9, err_msg="hard")
        np.testing.assert_allclose(float(soft_pen[i]), float(s_ref),
                                   rtol=1e-7, atol=1e-9, err_msg="soft")
        np.testing.assert_allclose(float(dyn[i]), float(d_ref),
                                   rtol=1e-7, atol=1e-10, err_msg="dyn")


def test_merit_terms_bl_backup_cost():
    """vel_penalty (SafeBackup) objective agrees batch-last vs per-problem."""
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    spec = OcpSpec(model, N=N, fast=True, vel_penalty=1e4, lm=0.0)
    rng = np.random.default_rng(3)
    xg, ug, _ = _problems(model, rng)
    sched = spec.default_schedule()
    cost, _, _, _ = spec.merit_terms_bl(xg, ug, sched)
    for i in range(B):
        c_ref = spec.total_cost(xg[i], ug[i], sched.p_ee)
        np.testing.assert_allclose(float(cost[i]), float(c_ref), rtol=1e-9)
