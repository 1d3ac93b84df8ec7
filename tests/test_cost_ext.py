"""EXT (exact-Hessian) cost type: closed-form point Hessian vs the AD
oracle, fast vs generic transcription, and the batch-last path.

Reference: cost_definition.py:83-100 (ReachTargetEXT requests
hessian_approx='EXACT'; the reference then disables it via
exact_hess_cost=0 at controller.py:109 — here EXT is implemented for
real, NLS reproduces the effective GN behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.ops.transcribe import OcpSpec

N = 5


@pytest.fixture(scope="module")
def model():
    return ManipulatorModel(load_config().with_(N=N, use_net=False))


def _states(model, B=4, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(model.x_min[: model.nq] + 0.1,
                    model.x_max[: model.nq] - 0.1, (B, N + 1, model.nq))
    v = rng.uniform(-0.8, 0.8, (B, N + 1, model.nq))
    xg = jnp.asarray(np.concatenate([q, v], axis=2))
    ug = jnp.asarray(rng.uniform(-2.0, 2.0, (B, N, model.nu)))
    return xg, ug


def test_point_hessian_matches_ad(model):
    robot = model.robot
    rng = np.random.default_rng(1)
    anc, offset = robot.frame_support(model.ee_frame)
    off = jnp.asarray(offset[:3, 3])

    def pt(q):
        return robot.frame_position(q, model.ee_frame)

    for _ in range(4):
        q = jnp.asarray(rng.uniform(-1.5, 1.5, robot.nq))
        poses = robot.joint_poses(q)
        p = pt(q)
        H = robot.point_hessian_from(poses, anc, p)          # (3, nq, nq)
        H_ad = jax.jacfwd(jax.jacfwd(pt))(q)                 # (3, nq, nq)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad),
                                   atol=1e-11)
        # symmetry
        np.testing.assert_allclose(np.asarray(H),
                                   np.asarray(jnp.swapaxes(H, 1, 2)),
                                   atol=1e-13)


def test_point_hessian_bl_matches_per_sample(model):
    robot = model.robot
    rng = np.random.default_rng(2)
    anc, _ = robot.frame_support(model.ee_frame)
    Q = jnp.asarray(rng.uniform(-1.5, 1.5, (6, robot.nq)))
    poses_bl = robot.joint_poses_bl(Q.T)
    pts = jax.vmap(lambda q: robot.frame_position(q, model.ee_frame))(Q)
    H_bl = robot.point_hessian_bl(poses_bl, anc, pts.T)      # (nq, nq, 3, K)
    for k in range(Q.shape[0]):
        poses = robot.joint_poses(Q[k])
        H = robot.point_hessian_from(poses, anc, pts[k])     # (3, nq, nq)
        np.testing.assert_allclose(np.asarray(H_bl[..., k]),
                                   np.asarray(jnp.moveaxis(H, 0, 2)),
                                   atol=1e-12)


def test_ext_qx_is_exact_cost_hessian(model):
    """EXT Qx block == jax.hessian of the stage cost (up to LM shift)."""
    spec = OcpSpec(model, N=N, fast=True, cost_type="EXT", lm=0.0)
    xg, ug = _states(model, B=1, seed=3)
    sched = spec.default_schedule()
    data = spec.transcribe(xg[0], ug[0], xg[0, 0], sched)

    dt = model.dt

    def stage_cost(x, k):
        err = model.ee_pos(x) - sched.p_ee[k]
        return spec.Q_w * jnp.sum(err * err)

    for k in (0, N):
        scale = dt if k < N else 1.0
        H = jax.hessian(lambda x: scale * stage_cost(x, k))(xg[0, k])
        np.testing.assert_allclose(np.asarray(data.Q[k]), np.asarray(H),
                                   atol=1e-9)


def test_ext_fast_matches_generic(model):
    fast = OcpSpec(model, N=N, fast=True, cost_type="EXT")
    slow = OcpSpec(model, N=N, fast=False, cost_type="EXT")
    xg, ug = _states(model, B=1, seed=4)
    sched = fast.default_schedule()
    df = fast.transcribe(xg[0], ug[0], xg[0, 0], sched)
    ds = slow.transcribe(xg[0], ug[0], xg[0, 0], sched)
    for field in ("Q", "q", "R", "r", "h", "Cx", "Cu"):
        np.testing.assert_allclose(
            np.asarray(getattr(df, field)), np.asarray(getattr(ds, field)),
            atol=5e-9, rtol=1e-7, err_msg=field)


def test_ext_bl_matches_per_problem(model):
    spec = OcpSpec(model, N=N, fast=True, cost_type="EXT")
    xg, ug = _states(model, B=4, seed=5)
    sched = spec.default_schedule()
    bl = spec.transcribe_bl(xg, ug, xg[:, 0], sched)
    ref = jax.vmap(lambda x, u: spec.transcribe(x, u, x[0], sched))(xg, ug)
    np.testing.assert_allclose(np.moveaxis(np.asarray(bl.Q), -1, 0),
                               np.asarray(ref.Q), atol=2e-8, rtol=1e-6)
    np.testing.assert_allclose(np.moveaxis(np.asarray(bl.q), -1, 0),
                               np.asarray(ref.q), atol=2e-8, rtol=1e-6)


def test_nls_has_no_curvature_term(model):
    """NLS == GN: Qx must be independent of the sign of the residual
    curvature (PSD by construction)."""
    spec = OcpSpec(model, N=N, fast=True, cost_type="NLS", lm=0.0)
    xg, ug = _states(model, B=1, seed=6)
    sched = spec.default_schedule()
    data = spec.transcribe(xg[0], ug[0], xg[0, 0], sched)
    w = np.linalg.eigvalsh(np.asarray(data.Q))
    assert (w >= -1e-10).all(), "GN Hessian must be PSD"


def test_cost_type_default_comes_from_config(model):
    assert OcpSpec(model, N=N).cost_type == "NLS"
    assert OcpSpec(model, N=N, cost_type="ext").cost_type == "EXT"
    with pytest.raises(ValueError):
        OcpSpec(model, N=N, cost_type="bogus")
