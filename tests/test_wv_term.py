"""Terminal velocity damping (NodeSchedule.wv_term) unit pins.

wv_term = 0 must leave the transcription bit-identical (the default /
reference cost semantics); wv_term > 0 must touch ONLY node N's cost
blocks, with the documented 2*wv Hessian / 2*wv*v gradient convention.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel


def _setup(N=8, B=3):
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("receding", model, N=N)
    rng = np.random.default_rng(0)
    mid = np.asarray((model.x_min + model.x_max) / 2)
    x0s = jnp.asarray(mid[None] + 0.1 * rng.standard_normal((B, model.nx)))
    xg = jnp.asarray(np.tile(np.asarray(x0s)[:, None], (1, N + 1, 1))
                     + 0.01 * rng.standard_normal((B, N + 1, model.nx)))
    ug = jnp.asarray(0.1 * rng.standard_normal((B, N, model.nu)))
    sched = ctrl.schedule(ctrl.initial_state(x0s[0]))
    return model, ctrl, x0s, xg, ug, sched


def test_wv_zero_is_identity():
    model, ctrl, x0s, xg, ug, sched = _setup()
    d0 = ctrl.spec.transcribe_bl(xg, ug, x0s, sched)
    sched_z = dataclasses.replace(sched, wv_term=jnp.zeros(()))
    d1 = ctrl.spec.transcribe_bl(xg, ug, x0s, sched_z)
    for f in d0.__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(d0, f)),
                                      np.asarray(getattr(d1, f)), err_msg=f)


def test_wv_touches_only_terminal_cost():
    model, ctrl, x0s, xg, ug, sched = _setup()
    N, nq = ctrl.N, model.nq
    wv = 7.0
    d0 = ctrl.spec.transcribe_bl(xg, ug, x0s, sched)
    sched_w = dataclasses.replace(sched, wv_term=jnp.asarray(wv))
    d1 = ctrl.spec.transcribe_bl(xg, ug, x0s, sched_w)
    # only Q[N] velocity diag and q[N] velocity entries change
    dQ = np.asarray(d1.Q) - np.asarray(d0.Q)
    dq = np.asarray(d1.q) - np.asarray(d0.q)
    np.testing.assert_array_equal(dQ[:N], 0.0)
    np.testing.assert_array_equal(dq[:N], 0.0)
    np.testing.assert_allclose(
        dQ[N, nq:, nq:],
        2 * wv * np.eye(nq)[:, :, None] * np.ones_like(dQ[N, nq:, nq:]),
        atol=1e-12)
    np.testing.assert_array_equal(dQ[N, :nq, :], 0.0)
    vg = np.asarray(xg)[:, N, nq:].T               # (nq, B)
    np.testing.assert_allclose(dq[N, nq:], 2 * wv * vg, atol=1e-12)
    np.testing.assert_array_equal(dq[N, :nq], 0.0)
    # constraint rows untouched
    for f in ("Cx", "Cu", "h", "lo", "up", "active", "R", "r"):
        np.testing.assert_array_equal(np.asarray(getattr(d0, f)),
                                      np.asarray(getattr(d1, f)), err_msg=f)


def test_wv_batch_leading_path_matches():
    """The batch-leading transcribe applies the same terminal term."""
    model, ctrl, x0s, xg, ug, sched = _setup()
    N, nq = ctrl.N, model.nq
    sched_w = dataclasses.replace(sched, wv_term=jnp.asarray(3.0))
    d_bl = ctrl.spec.transcribe_bl(xg, ug, x0s, sched_w)
    d_v = jax.vmap(lambda a, b, c: ctrl.spec.transcribe(a, b, c, sched_w))(
        xg, ug, x0s)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(d_bl.Q, -1, 0)),
                               np.asarray(d_v.Q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(d_bl.q, -1, 0)),
                               np.asarray(d_v.q), atol=1e-12)
