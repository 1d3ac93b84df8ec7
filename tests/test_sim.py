"""Closed-loop simulator tests: outcome classification, abort machinery,
noise ensembles (reference mpc.py behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.base import (MPCController, SafeBackupController,
                                           STWAController, StepResult)
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import MODE_DONE, ClosedLoopSim

N = 6


@pytest.fixture(scope="module")
def model():
    return ManipulatorModel(load_config().with_(N=N, use_net=False,
                                                back_hor=8))


def x0_batch(model, B=3):
    mid = (model.x_min + model.x_max) / 2
    x = np.tile(mid, (B, 1))
    x[:, model.nq:] = 0.0
    if B > 1:
        x[1, 0] += 0.15
    if B > 2:
        x[2, 1] += 0.2
    return jnp.asarray(x)


def test_nominal_sim_classification(model):
    ctrl = MPCController(model, N=N)
    sim = ClosedLoopSim(ctrl, backup=None)
    x0s = x0_batch(model)
    res = sim.run(x0s, n_steps=25)
    B = x0s.shape[0]
    # partition property: every problem in exactly one outcome set
    all_idx = sorted(res.conv_idx + res.collisions_idx + res.viable_idx
                     + res.unconv_idx)
    assert all_idx == list(range(B))
    assert res.xs.shape == (B, 26, model.nx)
    assert res.us.shape == (B, 25, model.nu)
    assert np.all(np.isfinite(res.xs[:, 0]))


def test_sim_with_noise_ensemble(model):
    # batched perturbed inertial params = the URDF-noise ensembles
    ctrl = MPCController(model, N=N)
    sim = ClosedLoopSim(ctrl, backup=None)
    x0s = x0_batch(model, 4)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    params = jax.vmap(
        lambda k: model.robot.default_params.perturbed(k, 5.0, 5.0, 5.0))(keys)
    res = sim.run(x0s, n_steps=15, plant_params=params)
    # different plants -> different trajectories from identical x0? (x0s
    # differ here, so just check integrity)
    assert np.all(np.isfinite(res.xs[:, 0]))
    assert res.counters.shape == (4, 5)


def test_obstacle_counter_fires_on_colliding_iterate(model):
    """Counter 2 (obstacle) counts ticks whose solver iterate x_temp has a
    colliding node (the reference's commented-out check, mpc.py:216-230).
    A nominal mid-range run never collides; a controller whose iterate is
    forced into the floor must count every tick."""
    ctrl = MPCController(model, N=N)
    sim = ClosedLoopSim(ctrl, backup=None)
    x0s = x0_batch(model, 2)
    res = sim.run(x0s, n_steps=10)
    assert np.all(res.counters[:, 2] == 0)

    # find a colliding joint state (straight-down posture hits the floor
    # for the Z1 scene; fall back to scanning boundary states)
    bad_q = None
    for cand in [np.asarray(model.x_min), np.asarray(model.x_max)]:
        c = cand.copy()
        c[model.nq:] = 0.0
        if not bool(model.check_collision(jnp.asarray(c))):
            bad_q = c
            break
    if bad_q is None:
        pytest.skip("no colliding bound state in this scene")

    class CollidingIterate(MPCController):
        def _post_step(self, state, sched, res):
            out = super()._post_step(state, sched, res)
            x_bad = jnp.tile(jnp.asarray(bad_q, res.xs.dtype),
                             (res.xs.shape[0], 1))
            return StepResult(u=out.u, abort=out.abort, state=out.state,
                              status=out.status, x_temp=x_bad,
                              u_temp=out.u_temp)

    ctrl2 = CollidingIterate(model, N=N)
    sim2 = ClosedLoopSim(ctrl2, backup=None)
    res2 = sim2.run(x0s, n_steps=5)
    assert np.all(res2.counters[:, 2] >= 1)


class AbortAtStep(STWAController):
    """Deterministic abort at a fixed step — drives the sim's abort path.
    Overrides BOTH controller entry points (the sim's hot path is
    step_batched; vmapped step is the reference-semantics oracle)."""

    abort_at = 4

    def _with_trigger(self, res, current_step):
        trigger = current_step == self.abort_at
        return StepResult(
            u=res.u, abort=jnp.logical_or(res.abort, trigger),
            state=res.state, status=res.status,
            x_temp=res.x_temp, u_temp=res.u_temp)

    def step(self, state, x):
        return self._with_trigger(super().step(state, x),
                                  state.current_step)

    def step_batched(self, states, xs):
        return self._with_trigger(super().step_batched(states, xs),
                                  states.current_step)


def test_abort_backup_and_recovery(model):
    ctrl = AbortAtStep(model, N=N)
    backup = SafeBackupController(model, N=8, qp_iters=10)
    sim = ClosedLoopSim(ctrl, backup=backup)
    mid = (model.x_min + model.x_max) / 2
    x0 = jnp.asarray(mid).at[model.nq:].set(0.0)
    x0s = jnp.stack([x0, x0.at[0].add(0.1)])
    res = sim.run(x0s, n_steps=35)
    st = res.final_state
    # both problems aborted, backup succeeded -> viable flag set
    assert bool(jnp.all(st.viable))
    assert np.all(np.isfinite(res.x_viable))
    # after following the 12-step abort trajectory + stabilization the arm
    # is (nearly) stopped or back in MPC mode
    assert not bool(jnp.any(st.failed))
    # recovery completed: braked below the resume threshold and back in MPC
    # mode (mpc.py:136-144), moving toward the target again
    assert np.all(np.asarray(st.mode) == 0)
    # viable classification (no convergence in 50 steps)
    assert res.viable_idx == [0, 1]


def test_abort_without_backup_is_failure(model):
    ctrl = AbortAtStep(model, N=N)
    sim = ClosedLoopSim(ctrl, backup=None)
    mid = (model.x_min + model.x_max) / 2
    x0s = jnp.asarray(mid)[None].at[:, model.nq:].set(0.0)
    res = sim.run(x0s, n_steps=20)
    assert res.collisions_idx == [0]
    assert int(res.final_state.mode[0]) == MODE_DONE


def test_constant_bias_noise_mode(model):
    # 'bias' mode (reference semantics): two runs with the same key give
    # identical trajectories; different keys differ.
    ctrl = MPCController(model, N=N)
    sim = ClosedLoopSim(ctrl, backup=None, control_noise_mode="bias")
    model_noisy = ManipulatorModel(
        load_config().with_(N=N, use_net=False, control_noise=2.0))
    ctrl2 = MPCController(model_noisy, N=N)
    sim2 = ClosedLoopSim(ctrl2, backup=None, control_noise_mode="bias")
    x0s = x0_batch(model, 2)
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    r1 = sim2.run(x0s, n_steps=10, keys=keys)
    r2 = sim2.run(x0s, n_steps=10, keys=keys)
    np.testing.assert_allclose(r1.xs, r2.xs, atol=0)


def test_crash_test_grid(tmp_path):
    """apps/crash_test.py runs the velocity x horizon grid end-to-end
    (the reference's test_schianto.py:41-105 role) and writes the JSON
    artifact with one cell per (h, v). Runs as a subprocess — the real
    CLI surface, and isolated from this process's XLA compiler state
    (running it in-process after ~140 suite compiles segfaulted the
    XLA CPU backend_compile on this box)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "apps", "crash_test.py"),
         "--cpu", "--horizons", "6", "--velocities", "0.3",
         "--batch", "2", "--n_steps", "8", "--out_dir", out_dir],
        cwd=repo, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.load(open(f"{out_dir}/z1_receding_crash_test.json"))
    assert set(out) == {"h6_v0.3"}
    cell = out["h6_v0.3"]
    assert cell["of"] == 2 and 0 <= cell["fails"] <= 2
