"""End-to-end tracking closed loops (reference tracking experiments:
guess_acados.py:167-227 + mpc.py with track_traj; cost_definition.py
trajectory generators). Drives the lemniscate task for 50 closed-loop
steps from an IK-seeded start and checks the loop actually follows the
moving reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, \
    get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
from safe_mpc_tpu.tasks.ik import solve_ik_multistart
from safe_mpc_tpu.tasks.trajectories import get_trajectory

N = 20
STEPS = 50


@pytest.mark.parametrize("name", ["shape8", "circle"])
def test_tracking_closed_loop(name):
    cfg = load_config().with_(N=N, use_net=False, track_traj=True)
    model = ManipulatorModel(cfg)
    traj = get_trajectory(cfg, name, N=N)
    traj = traj[:, : STEPS + 1 + N]

    x0, ok = solve_ik_multistart(model, jnp.asarray(traj[:, 0]))
    assert bool(ok), "IK on the trajectory start failed"

    ctrl = get_controller("naive", model, N=N, traj=traj)
    # tracking guess: one full-SQP solve of the tracking OCP at t=0
    # (the apps/guess.py --track branch does exactly this)
    guess_ctrl = get_guess_controller("naive", model, N=N, rti_iters=60,
                                      traj=traj)
    st0 = guess_ctrl.initial_state(x0)
    init = guess_ctrl.solve(st0, x0, guess_ctrl.schedule(st0))
    assert int(init.status) == 0

    B = 2
    sim = ClosedLoopSim(ctrl, backup=None)
    x0s = jnp.tile(x0[None], (B, 1))
    xg = jnp.tile(init.xs[None], (B, 1, 1))
    ug = jnp.tile(init.us[None], (B, 1, 1))
    res = sim.run(x0s, xg=xg, ug=ug, n_steps=STEPS, segment=None)

    assert len(res.collisions_idx) == 0
    # the loop tracks the moving reference: mean EE error over the
    # final half of the window stays within a few cm of the reference
    ee = np.asarray(jax.vmap(jax.vmap(model.ee_pos))(
        jnp.asarray(res.xs)))                       # (B, STEPS+1, 3)
    ref = np.asarray(traj[:, : STEPS + 1]).T[None]  # (1, STEPS+1, 3)
    err = np.linalg.norm(ee - ref, axis=2)
    assert np.isfinite(err).all()
    mean_tail = err[:, STEPS // 2:].mean()
    assert mean_tail < 0.05, f"tracking error too large: {mean_tail:.4f}"
