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
