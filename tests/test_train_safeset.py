"""Safe-set learning pipeline: label sanity, training, checkpoint round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.models.safeset import NetSafeSet
from safe_mpc_tpu.tasks import train_safeset as ts


@pytest.fixture(scope="module")
def model():
    return ManipulatorModel(load_config().with_(use_net=False, back_hor=10))


@pytest.fixture(scope="module")
def labels(model):
    qs, dirs, s = ts.generate_labels(model, 8, backup_N=10,
                                     bisection_iters=3, qp_iters=10,
                                     sqp_iters=15)
    return qs, dirs, s


def test_labels_within_caps(model, labels):
    qs, dirs, s = labels
    assert s.shape == (8,)
    assert np.all(s >= 0)
    # velocity at s* stays within the per-joint box
    v = s[:, None] * dirs
    assert np.all(np.abs(v) <= model.x_max[model.nq:] + 1e-6)


def test_braking_monotonicity(model, labels):
    # braking from s*/2 along the same direction must also be feasible
    import jax
    from safe_mpc_tpu.controllers.base import SafeBackupController
    qs, dirs, s = labels
    backup = SafeBackupController(model, N=10, qp_iters=10)
    feas = jax.jit(jax.vmap(
        lambda q, d, sv: ts._braking_feasible(
            backup, jnp.concatenate([q, sv * d]), max_iters=15)))
    ok = feas(jnp.asarray(qs), jnp.asarray(dirs), jnp.asarray(s) * 0.5)
    assert np.mean(np.asarray(ok)) > 0.8


def test_train_and_roundtrip(model, labels, tmp_path):
    qs, dirs, s = labels
    params, hist = ts.train_net(qs, dirs, s, hidden=32, epochs=60,
                                batch_size=8, val_frac=0.25)
    assert hist["train"][-1] < hist["train"][0]

    # npz round-trip
    p = tmp_path / "net.npz"
    ts.save_npz(str(p), params)
    params2 = ts.load_npz(str(p))
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, 16).reshape(16)[
        : 2 * model.nq].astype(np.float32))
    from safe_mpc_tpu.models.safeset import ACTIVATIONS, mlp_forward
    np.testing.assert_allclose(
        np.asarray(mlp_forward(params, x[: 2 * model.nq], ACTIVATIONS["gelu"])),
        np.asarray(mlp_forward(params2, x[: 2 * model.nq], ACTIVATIONS["gelu"])),
        atol=0)

    # torch-format export loads into NetSafeSet
    torch = pytest.importorskip("torch")
    pt = tmp_path / "net.pt"
    ts.export_torch_checkpoint(str(pt), params)
    sset = NetSafeSet(model, checkpoint=str(pt))
    xx = jnp.zeros(model.nx).at[model.nq].set(0.5)
    val = sset.value(xx, 10.0)
    assert np.isfinite(float(val[0]))
    # trained net at rest-ish velocity: predicted margin consistent with
    # raw_net * 0.9 - |v|
    out, vn = sset.raw_net(xx)
    np.testing.assert_allclose(float(val[0]), float(out) * 0.9 - float(vn),
                               rtol=1e-5)
