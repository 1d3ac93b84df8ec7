"""f32 error-budget invariants (docs/f32_error_budget.md).

Asserts that every widened f32 tolerance sits inside its physical
margin on the LIVE model, so a config/scene change that breaks the
budget fails the suite rather than silently eroding the safety claims.
"""

import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.models.manipulator import ManipulatorModel

F32_HARD_TOL = 3e-4       # ops/qp.py / ops/qp_batched.py f32 floor
F32_TAU_TOL = 1e-3        # models/manipulator.py::check_torque_bounds
F32_DYN_TOL = 2e-4        # models/manipulator.py::check_dynamics


@pytest.fixture(scope="module")
def model():
    return ManipulatorModel(load_config())


def test_collision_erosion_inside_geometric_padding(model):
    """QP-admitted center-line erosion << capsule padding, and the
    plant-side checker is stricter than the solver."""
    # smallest contact distance at a constraint boundary across rows with
    # squared-distance semantics (lo > 0 identifies them)
    lows = np.asarray([float(np.min(r.check_lo)) for r in model.collision_rows])
    lows = lows[lows > 1e-6]
    d_min = np.sqrt(lows.min())
    erosion = F32_HARD_TOL / (2.0 * d_min)
    assert erosion < 2e-3, f"QP erosion {erosion:.2e} m exceeds 2 mm"
    # modeled capsule radii pad the physical links by >= 10 mm; require
    # 5x headroom over the admitted erosion
    padding = 0.010
    assert erosion * 5 < padding
    # the failure checker (tol_obs on d^2) must be stricter than the QP
    assert model.cfg.tol_obs < F32_HARD_TOL


def test_torque_tolerance_inside_actuator_range(model):
    rng = np.min(np.asarray(model.tau_max) - np.asarray(model.tau_min))
    assert F32_TAU_TOL < 1e-4 * rng, "torque check tol > 0.01% of range"
    # f32 round-off of the largest torque bound, with accumulation room
    roundoff = np.max(np.abs(model.tau_max)) * 2.0 ** -24
    assert F32_TAU_TOL > 30 * roundoff, "tolerance too tight for f32"


def test_dynamics_tolerance_inside_step_increment(model):
    step = model.dt * float(np.max(np.abs(model.x_max[model.nq:])))
    assert F32_DYN_TOL < 0.02 * step, "dyn tol > 2% of one step's motion"


def test_joint_bound_tolerance_is_reference_value(model):
    assert model.cfg.tol_x == pytest.approx(5e-3), \
        "tol_x must stay at the reference's own value (not widened)"
    roundoff = float(np.max(np.abs(model.x_max[: model.nq]))) * 2.0 ** -24
    assert model.cfg.tol_x > 1e3 * roundoff
