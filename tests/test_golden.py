"""Golden parity pins (VERDICT r2 #5): committed f64 CPU guess +
closed-loop trajectories (scripts_dev/make_golden.py) — the strongest
feasible stand-in for recorded reference acados outputs. Any refactor
of the solver/controller/sim stack must reproduce the SAME controls
from identical state to <1e-6 (the BASELINE tolerance is 1e-3 vs the
reference; internal reproducibility is pinned three orders tighter).

The relaxed f32 cross-precision test (test_parity.py) is unchanged —
this file pins f64-vs-f64 determinism of the code path itself.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "golden_z1.npz")
N, STEPS = 10, 40


@pytest.fixture(scope="module")
def golden():
    if not os.path.isfile(GOLDEN):
        pytest.skip("golden data not generated "
                    "(scripts_dev/make_golden.py)")
    return dict(np.load(GOLDEN))


@pytest.mark.parametrize("cont_name,use_net",
                         [("naive", False), ("receding", True)])
def test_golden_closed_loop(golden, cont_name, use_net):
    cfg = load_config().with_(N=N, use_net=use_net)
    model = ManipulatorModel(cfg)
    ctrl = get_controller(cont_name, model, N=N)
    sim = ClosedLoopSim(ctrl, backup=None)

    x0s = jnp.asarray(golden[f"{cont_name}_x0"])
    xg = jnp.asarray(golden[f"{cont_name}_xg"])
    ug = jnp.asarray(golden[f"{cont_name}_ug"])
    res = sim.run(x0s, xg=xg, ug=ug, n_steps=STEPS, segment=None)

    us = np.asarray(res.us)
    gold_us = golden[f"{cont_name}_us"]
    mask = np.isfinite(gold_us)
    np.testing.assert_array_equal(np.isfinite(us), mask)
    dev = np.abs(us[mask] - gold_us[mask]).max() if mask.any() else 0.0
    assert dev < 1e-6, f"golden control deviation {dev:.2e}"

    xs = np.asarray(res.xs)
    gold_xs = golden[f"{cont_name}_xs"]
    maskx = np.isfinite(gold_xs)
    devx = np.abs(xs[maskx] - gold_xs[maskx]).max() if maskx.any() else 0.0
    assert devx < 1e-6, f"golden state deviation {devx:.2e}"

    if cont_name == "receding":
        np.testing.assert_array_equal(np.asarray(res.rs),
                                      golden["receding_rs"])
