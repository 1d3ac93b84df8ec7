"""Safe-set tests: torch checkpoint interop, GELU bit-compat, analytic set."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.models import safeset as ss


@pytest.fixture(scope="module")
def model():
    return ManipulatorModel(load_config())


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    """Create a reference-format checkpoint with torch (safe_set.py:76-78)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    import torch.nn as nn

    net = nn.Sequential(
        nn.Linear(10, 256), nn.GELU(approximate="tanh"),
        nn.Linear(256, 256), nn.GELU(approximate="tanh"),
        nn.Linear(256, 256), nn.GELU(approximate="tanh"),
        nn.Linear(256, 1),
    )

    class Wrapper(nn.Module):
        def __init__(self):
            super().__init__()
            self.linear_stack = net

    w = Wrapper()
    path = tmp_path_factory.mktemp("ckpt") / "net.pt"
    torch.save({
        "model": w.state_dict(),
        "mean": torch.zeros(5) + 0.1,
        "std": torch.ones(5) * 1.7,
    }, path)
    return str(path), w


def test_gelu_tanh_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(ss.gelu_tanh(jnp.asarray(x)))
    theirs = torch.nn.GELU(approximate="tanh")(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_checkpoint_roundtrip_forward(model, torch_ckpt):
    torch = pytest.importorskip("torch")
    path, wrapper = torch_ckpt
    net = ss.NetSafeSet(model, checkpoint=path)
    x = np.random.default_rng(0).uniform(-0.5, 0.5, model.nx).astype(np.float64)

    # reference input encoding (safe_set.py:82-87)
    xe = x.copy()
    xe[model.nq] += model.cfg.eps
    v = xe[model.nq:]
    vel_norm = np.linalg.norm(v)
    pos = (xe[:5] - 0.1) / 1.7
    state = np.concatenate([pos, v / vel_norm]).astype(np.float32)
    with torch.no_grad():
        t_out = wrapper.linear_stack(torch.from_numpy(state)).numpy()[0]

    out, vn = net.raw_net(jnp.asarray(x))
    np.testing.assert_allclose(float(out), t_out, atol=2e-5)
    np.testing.assert_allclose(float(vn), vel_norm, rtol=1e-6)

    # constraint value: NN * (100-alpha)/100 - |v|
    val = net.value(jnp.asarray(x), 10.0)
    np.testing.assert_allclose(
        float(val[0]), t_out * 0.9 - vel_norm, atol=2e-5)


def test_net_safe_set_jacobian_finite(model, torch_ckpt):
    path, _ = torch_ckpt
    net = ss.NetSafeSet(model, checkpoint=path)
    x = jnp.asarray(np.random.default_rng(1).uniform(-0.5, 0.5, model.nx))
    J = jax.jacrev(lambda xx: net.value(xx, 10.0))(x)
    assert J.shape == (1, model.nx)
    assert np.all(np.isfinite(J))


def test_net_check_alpha_monotone(model, torch_ckpt):
    # Larger alpha shrinks the set: value decreases when net output > 0.
    path, _ = torch_ckpt
    net = ss.NetSafeSet(model, checkpoint=path)
    x = jnp.asarray(np.random.default_rng(2).uniform(-0.3, 0.3, model.nx))
    out, _ = net.raw_net(x)
    v10 = float(net.value(x, 10.0)[0])
    v50 = float(net.value(x, 50.0)[0])
    if float(out) > 0:
        assert v50 < v10


def test_analytic_set_rows(model):
    aset = ss.AnalyticSafeSet(model)
    # 1 plane row + 2*nd joint rows
    assert aset.n_constraints == 1 + 2 * model.cfg.n_dof_safe_set
    # At rest in the middle of the range the set is satisfied.
    x = jnp.asarray((model.x_min + model.x_max) / 2).at[model.nq:].set(0.0)
    assert bool(aset.check(x))


def test_analytic_set_violated_near_bound(model):
    aset = ss.AnalyticSafeSet(model)
    # Moving fast toward a nearby joint limit violates braking feasibility.
    q = (model.x_min[: model.nq] + model.x_max[: model.nq]) / 2
    q[1] = model.x_max[1] - 1e-4
    x = jnp.concatenate([jnp.asarray(q), jnp.zeros(model.nq)]).at[model.nq + 1].set(3.0)
    assert not bool(aset.check(x))


def test_zip_reader_fallback(model, torch_ckpt, monkeypatch):
    # Force the no-torch path and compare against the torch loader.
    path, _ = torch_ckpt
    ref = ss.load_torch_checkpoint(path)
    import builtins
    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name == "torch":
            raise ImportError("blocked")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    raw = ss.load_torch_checkpoint(path)
    for key in ref["model"]:
        np.testing.assert_allclose(raw["model"][key], ref["model"][key], atol=0)
    np.testing.assert_allclose(np.asarray(raw["mean"]), ref["mean"], atol=0)


def test_net_value_bl_matches_per_sample(model, torch_ckpt):
    path, _ = torch_ckpt
    nss = ss.NetSafeSet(model, checkpoint=path)
    rng = np.random.default_rng(31)
    K = 6
    X = jnp.asarray(rng.uniform(-1, 1, (model.nx, K)))
    out_bl = nss.value_bl(X, nss.cfg.alpha)                   # (1, K)
    for k in range(K):
        np.testing.assert_allclose(out_bl[0, k],
                                   nss.value(X[:, k], nss.cfg.alpha),
                                   atol=1e-11)


def test_analytic_value_bl_matches_per_sample(model):
    aset = ss.AnalyticSafeSet(model)
    rng = np.random.default_rng(32)
    K = 5
    q = rng.uniform(model.x_min[: model.nq], model.x_max[: model.nq],
                    (K, model.nq))
    v = 0.5 * rng.uniform(-1, 1, (K, model.nq))
    X = jnp.concatenate([jnp.asarray(q), jnp.asarray(v)], axis=1).T
    out_bl = aset.value_bl(X)                                 # (ns, K)
    for k in range(K):
        np.testing.assert_allclose(out_bl[:, k], aset.value(X[:, k]),
                                   atol=1e-11)
