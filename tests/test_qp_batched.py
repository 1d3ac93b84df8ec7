"""Batch-major QP solver vs the vmapped batch-leading solver: identical."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.ops.qp import solve_qp
from safe_mpc_tpu.ops.qp_batched import solve_qp_batched

from test_qp import make_data  # noqa: E402  (same directory)


def _stack(datas):
    # solve_qp_batched assumes shared dynamics across the batch (true for
    # the manipulator OCP); give every test problem problem-0's A, B
    from safe_mpc_tpu.ops.qp import QPData
    datas = [QPData(**{**{k: getattr(d, k) for k in d.__dataclass_fields__},
                       "A": datas[0].A, "B": datas[0].B}) for d in datas]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *datas)


def test_batch_major_matches_vmapped():
    datas = [make_data(s, soft_rows=1) for s in range(4)]
    batched = _stack(datas)
    ref = jax.vmap(lambda d: solve_qp(d, iters=25))(batched)
    out = solve_qp_batched(batched, iters=25)
    np.testing.assert_allclose(np.asarray(out.dx), np.asarray(ref.dx),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.du), np.asarray(ref.du),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.sl), np.asarray(ref.sl),
                               atol=1e-8)
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))


def test_warm_restart_matches_cold():
    """Warm re-entry at a previous solve's IP state (same data) reaches
    PRODUCTION accuracy (the cold 15-iteration schedule, the deployed
    per-tick configuration) in WARM_ITERS=8 iterations — the warm
    start's contract: same solution quality at ~half the iterations.
    Accuracy is measured against a near-converged cold-25 solve."""
    from safe_mpc_tpu.ops.qp import WARM_ITERS, WARM_MU0

    datas = [make_data(s, soft_rows=1) for s in range(4)]
    batched = _stack(datas)
    cold25 = solve_qp_batched(batched, iters=25)
    cold15 = solve_qp_batched(batched, iters=15)
    assert cold25.warm is not None

    # 8 iterations on these synthetic stress problems (random QPs are
    # harsher than the Z1 OCP); the deployed WARM_ITERS=6 is validated
    # on the real OCP chain (test_sqp.py::test_rti_warm_chain_matches
    # _cold) and by the TPU bench's ok_fraction
    warm = solve_qp_batched(batched, iters=max(8, WARM_ITERS),
                            mu0=WARM_MU0, warm=cold25.warm)
    assert np.all(np.asarray(warm.status) == 0)

    def err(sol, field):
        return np.abs(np.asarray(getattr(sol, field))
                      - np.asarray(getattr(cold25, field))).max()

    assert err(warm, "dx") <= 1.5 * err(cold15, "dx") + 1e-6, \
        (err(warm, "dx"), err(cold15, "dx"))
    assert err(warm, "du") <= 1.5 * err(cold15, "du") + 1e-6, \
        (err(warm, "du"), err(cold15, "du"))


def test_warm_restart_perturbed_data():
    """Warm re-entry on a slightly perturbed QP (the RTI tick-to-tick
    situation) reaches that QP's own solution at production (cold-15)
    accuracy in WARM_ITERS iterations."""
    from safe_mpc_tpu.ops.qp import QPData, WARM_ITERS, WARM_MU0

    datas = [make_data(s, soft_rows=1) for s in range(4)]
    batched = _stack(datas)
    prev = solve_qp_batched(batched, iters=25)

    pert = QPData(**{
        **{k: getattr(batched, k) for k in batched.__dataclass_fields__},
        "q": batched.q + 1e-2, "h": batched.h + 1e-3})
    cold25 = solve_qp_batched(pert, iters=25)
    cold15 = solve_qp_batched(pert, iters=15)
    warm = solve_qp_batched(pert, iters=max(8, WARM_ITERS),
                            mu0=WARM_MU0, warm=prev.warm)
    assert np.all(np.asarray(warm.status) == 0)

    def err(sol, field):
        return np.abs(np.asarray(getattr(sol, field))
                      - np.asarray(getattr(cold25, field))).max()

    assert err(warm, "dx") <= 1.5 * err(cold15, "dx") + 1e-6, \
        (err(warm, "dx"), err(cold15, "dx"))
    assert err(warm, "du") <= 1.5 * err(cold15, "du") + 1e-6, \
        (err(warm, "du"), err(cold15, "du"))


def test_batch_major_detects_infeasible():
    good = make_data(1)     # known feasible (test_qp hard-ineq test)
    bad = make_data(4)
    lo = np.asarray(bad.lo).copy()
    up = np.asarray(bad.up).copy()
    Cx = np.asarray(bad.Cx).copy()
    Cu = np.asarray(bad.Cu).copy()
    lo[:, 0] = 10.0
    up[:, 0] = 11.0
    Cx[:, 0, :] = 0.0
    Cu[:, 0, :] = 0.0
    from safe_mpc_tpu.ops.qp import QPData
    bad = QPData(**{**{k: getattr(bad, k) for k in bad.__dataclass_fields__},
                    "lo": jnp.asarray(lo), "up": jnp.asarray(up),
                    "Cx": jnp.asarray(Cx), "Cu": jnp.asarray(Cu)})
    batched = _stack([good, bad])
    out = solve_qp_batched(batched, iters=25)
    assert int(out.status[0]) == 0
    assert int(out.status[1]) == 4
