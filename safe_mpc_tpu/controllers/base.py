"""Controller layer: the reference's 9 controller variants as pure,
batchable step functions over constraint-schedule data.

Reference: controller.py:12-712. Where the reference mutates a live acados
solver per node (`cost_set`/`constraints_set`/`set(p)`), each variant here
derives a :class:`NodeSchedule` from its state — receding indices, slack
weights and activation masks are arrays, and the per-tick state machine
(fails counter, viable state, abort flag) is a masked pytree update, so
thousands of controllers step as one batched program.

Step contract (reference §3.3): ``step(state, x) -> StepResult`` with
``u``, ``abort`` and the updated state. A failed solve never stops
control: the previous plan is replayed shifted (provideControl rollback,
controller.py:169-184).

Reference quirk reproduced intentionally: `checkStateConstraints` on a
trajectory checks bounds on every node but collision only on the first
row (env_model.py:236-243 — the early ``return True`` sits inside the row
loop), so the controllers' internal accept test does the same; the
simulator checks every actual state.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SafeMpcConfig
from ..models.manipulator import ManipulatorModel
from ..models.safeset import create_safe_set
from ..ops.qp import solve_qp
from ..ops.sqp import (SolveResult, rti_step, rti_step_batched, sqp_solve,
                       sqp_solve_batched)
from ..ops.transcribe import NodeSchedule, OcpSpec


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ControllerState:
    xg: jax.Array            # (N+1, nx) current guess
    ug: jax.Array            # (N, nu)
    x_viable: jax.Array      # (nx,) last viable state for the abort solver
    fails: jax.Array         # int32 consecutive-failure counter
    r: jax.Array             # int32 receding index (N if unused)
    current_step: jax.Array  # int32 closed-loop time index (traj window)
    last_status: jax.Array   # int32
    p_guide: jax.Array       # (P, 3) EE guidance plan (stall guidance);
    #                          P = controller.guide_len (1 = static point)
    plan_ptr: jax.Array      # int32 current node on the guidance plan
    guide_on: jax.Array      # bool: track p_guide instead of the task ref


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StepResult:
    u: jax.Array             # (nu,) control to apply
    abort: jax.Array         # bool: switch to the safe-abort machinery
    state: ControllerState
    status: jax.Array        # solver status of this tick
    x_temp: jax.Array        # (N+1, nx) this tick's solver iterate
    u_temp: jax.Array


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class MPCController:
    """Base: the NaiveController (controller.py:251-292)."""

    name = "naive"
    uses_safe_set = False
    soft_terminal_set = False      # ST
    hard_terminal_set = False      # HTWA / parallel / real_receding
    running_set = False            # receding / parallel / everywhere
    terminal_zero_vel = False      # zerovel / backup
    with_abort = False             # STWA family state machine
    skip_guess_correction = False  # RealReceding (controller.py:524)

    def __init__(self, model: ManipulatorModel, N: int | None = None,
                 safe_set=None, rti_iters: int | None = None,
                 qp_iters: int = 25, traj: np.ndarray | None = None,
                 guide_len: int = 1, lm_drop_tol: float = 0.0,
                 lm_drop_factor: float = 0.02,
                 zv_near_tol: float = 0.0, zv_vmax: float = 0.5,
                 wv_near_tol: float = 0.0, wv_weight: float = 5.0,
                 handover_tol: float = 0.0,
                 **spec_kw):
        cfg = model.cfg
        self.model = model
        self.cfg = cfg
        self.N = int(N if N is not None else cfg.N)
        # near-target LM drop (per problem, via NodeSchedule.lm_scale):
        # once the EE error falls under lm_drop_tol, the LM anchor to the
        # previous plan is scaled by lm_drop_factor so it stops fighting
        # the final millimetre (flagship near-miss census, VERDICT r2).
        # 0 disables (the default — reference semantics keep LM fixed,
        # config.yaml:21).
        self.lm_drop_tol = float(lm_drop_tol)
        self.lm_drop_factor = float(lm_drop_factor)
        # near-target ARRIVE-AND-STOP lever (terminal v_N = 0 box per
        # problem once err < zv_near_tol at low speed). MEASURED HARMFUL
        # (round-4 near-miss diagnostic): problems park exactly at the
        # activation boundary (~zv_near_tol) because the braking plans
        # stop short and the box reopens outside the band. Kept only as
        # an off-by-default experiment flag; the plain loop with
        # f32-highest matmuls converges 7/8 from 1.5-8 mm starts in 300
        # steps without it.
        self.zv_near_tol = float(zv_near_tol)
        self.zv_vmax = float(zv_vmax)
        # near-target terminal velocity DAMPING (the smooth alternative
        # to the zv box): once err < wv_near_tol, wv_weight*||v_N||^2
        # joins the cost, making rest-at-target the unique minimum — the
        # reach cost alone scores only EE position + u, so velocity in
        # the EE null space is cost-free and the loop can orbit the
        # target indefinitely (measured: round-4 flagship run 1, 21/47
        # failures touched <1 mm then drifted off at ~0.25 rad/s).
        # 0 disables (default — reference cost semantics untouched).
        self.wv_near_tol = float(wv_near_tol)
        self.wv_weight = float(wv_weight)
        # in-graph guidance handover radius (see schedule()); 0 disables
        # (default — guidance then releases only at host segment hooks).
        # 0.025 recommended: inside the measured greedy basin/finisher
        # reach (2.5 cm) and strictly below the 3 cm wedge-band floor,
        # so a HELD park in the wedge band can never be unparked by it.
        self.handover_tol = float(handover_tol)
        # guidance-plan buffer length P: 1 = a single static via point;
        # >1 = a timed EE path tracked node-by-node (sim/replan.py sets
        # P = replan_N + 1 so each MPC node i tracks plan node ptr + i)
        self.guide_len = int(guide_len)
        if self.uses_safe_set and safe_set is None:
            safe_set = create_safe_set(model)
        self.safe_set = safe_set if self.uses_safe_set else None
        self.spec = OcpSpec(model, safe_set=self.safe_set, N=self.N, **spec_kw)
        self.rti_iters = int(rti_iters if rti_iters is not None
                             else cfg.rti_iter)
        self.qp_iters = qp_iters
        # reference trajectory, (3, n_steps + 1 + N) (cost_definition.py:32);
        # regulation tasks tile ee_ref
        if traj is None:
            traj = np.tile(np.asarray(model.ee_ref)[:, None],
                           (1, cfg.n_steps + 1 + self.N))
        self.traj = np.asarray(traj)

    # ------------------------------------------------------------ state

    def initial_state(self, x0, xg=None, ug=None, dtype=None) -> ControllerState:
        dtype = dtype or jnp.asarray(x0).dtype
        N, nx, nu = self.N, self.model.nx, self.model.nu
        if xg is None:
            xg = jnp.tile(jnp.asarray(x0, dtype), (N + 1, 1))
        if ug is None:
            ug = jnp.zeros((N, nu), dtype)
        return ControllerState(
            xg=jnp.asarray(xg, dtype), ug=jnp.asarray(ug, dtype),
            x_viable=jnp.asarray(xg, dtype)[-1],
            fails=jnp.zeros((), jnp.int32),
            r=jnp.asarray(self.N, jnp.int32),
            current_step=jnp.zeros((), jnp.int32),
            last_status=jnp.full((), 4, jnp.int32),
            p_guide=jnp.zeros((self.guide_len, 3), dtype),
            plan_ptr=jnp.zeros((), jnp.int32),
            guide_on=jnp.zeros((), bool))

    def set_guess(self, state: ControllerState, xg, ug) -> ControllerState:
        # reference setGuess also refreshes x_viable (controller.py:390-393)
        return dataclasses.replace(state, xg=xg, ug=ug, x_viable=xg[-1])

    # ------------------------------------------------------------ schedule

    def _traj_window(self, state: ControllerState, dtype):
        tr = jnp.asarray(self.traj, dtype)           # (3, T)
        w = jax.lax.dynamic_slice_in_dim(
            tr, state.current_step, self.N + 1, axis=1)
        return w.T                                   # (N+1, 3)

    def schedule(self, state: ControllerState) -> NodeSchedule:
        dtype = state.xg.dtype
        cfg = self.cfg
        N = self.N
        sched = self.spec.default_schedule(dtype)
        w = self._traj_window(state, dtype)
        # in-graph guidance HANDOVER: once the true task error is inside
        # the greedy convergence basin (scripts_dev/diag_fixedpoint), an
        # active guidance plan is ignored for this tick — the host-side
        # handover (sim/replan.py::_update_guidance, err < 0.03) only
        # runs at segment hooks, so a problem arriving near the target
        # AFTER the last hook kept tracking its plan's clock with the
        # wv/lm-drop near-target machinery disabled, and orbited off
        # (round-4 run-3 census: 11 late arrivals ended 1.4-9.7 mm out
        # with |v| up to 0.9). Measured vs the hook-only handover on the
        # same episode; host hooks still formalize PLAN -> TRACK.
        err_task = jnp.linalg.norm(self.model.ee_pos(state.xg[0]) - w[0])
        guide = state.guide_on
        if self.handover_tol > 0:
            guide = jnp.logical_and(guide, err_task >= self.handover_tol)
        # stall-guidance override (sim/replan.py): an accepted long
        # -horizon plan's EE path replaces the task reference until the
        # plan is consumed — node i tracks plan node plan_ptr + i (the
        # same time-varying-p machinery as the tracking tasks, made per
        # -problem), so the MPC follows the plan's route AND timing
        # instead of pursuing a distant point. Constraints are
        # untouched: the safety machinery is identical under guidance.
        idx = jnp.clip(state.plan_ptr + jnp.arange(self.N + 1),
                       0, self.guide_len - 1)
        p_ee = jnp.where(guide, state.p_guide[idx], w)
        sched = dataclasses.replace(sched, p_ee=p_ee,
                                    alpha=jnp.asarray(cfg.alpha, dtype))
        # near-target gates below use err_task: identical to the old
        # ||ee - p_ee[0]|| when unguided (p_ee[0] == w[0]), and while
        # guided the gates are off via ~guide anyway
        if self.lm_drop_tol > 0:
            near = jnp.logical_and(err_task < self.lm_drop_tol, ~guide)
            sched = dataclasses.replace(
                sched, lm_scale=jnp.where(
                    near, self.lm_drop_factor, 1.0).astype(dtype))
        if self.wv_near_tol > 0:
            near = jnp.logical_and(err_task < self.wv_near_tol, ~guide)
            sched = dataclasses.replace(
                sched, wv_term=jnp.where(
                    near, self.wv_weight, 0.0).astype(dtype))
        if self.zv_near_tol > 0:
            nq = self.model.nq
            vmax = jnp.max(jnp.abs(state.xg[0, nq:]))
            stop = jnp.logical_and(
                jnp.logical_and(err_task < self.zv_near_tol,
                                vmax < self.zv_vmax),
                ~guide)
            sched = dataclasses.replace(
                sched,
                lbx=sched.lbx.at[N, nq:].set(
                    jnp.where(stop, 0.0, sched.lbx[N, nq:])),
                ubx=sched.ubx.at[N, nq:].set(
                    jnp.where(stop, 0.0, sched.ubx[N, nq:])))
        if self.terminal_zero_vel:
            nq = self.model.nq
            sched = dataclasses.replace(
                sched,
                lbx=sched.lbx.at[N, nq:].set(0.0),
                ubx=sched.ubx.at[N, nq:].set(0.0))
        if self.soft_terminal_set or self.hard_terminal_set:
            soft = 1.0 if self.soft_terminal_set else 0.0
            w = cfg.ws_r if self.soft_terminal_set else 0.0
            sched = dataclasses.replace(
                sched,
                safe_active=sched.safe_active.at[N].set(1.0),
                safe_soft=sched.safe_soft.at[N].set(soft),
                safe_zl=sched.safe_zl.at[N].set(w),
                safe_zu=sched.safe_zu.at[N].set(w))
        return sched

    # ------------------------------------------------------------ pieces

    def guess_correction(self, state: ControllerState) -> ControllerState:
        """Re-rollout the guess through the nominal dynamics
        (controller.py:226-231)."""
        if self.skip_guess_correction:
            return state
        xg = self.model.rollout(state.xg[0], state.ug)
        return dataclasses.replace(state, xg=xg)

    def solve(self, state: ControllerState, x, sched) -> SolveResult:
        if self.rti_iters <= 1:
            return rti_step(self.spec, state.xg, state.ug, x, sched,
                            qp_iters=self.qp_iters)
        return sqp_solve(self.spec, state.xg, state.ug, x, sched,
                         max_iters=self.rti_iters, qp_iters=self.qp_iters)

    def solve_batched(self, states: ControllerState, xs, scheds) -> SolveResult:
        """Whole-batch solve on the batch-last pipeline (`rti_step_batched`
        / `sqp_solve_batched`); `scheds` carries a leading batch axis (one
        schedule per problem — receding indices etc. diverge freely)."""
        if self.rti_iters <= 1:
            return rti_step_batched(self.spec, states.xg, states.ug, xs,
                                    scheds, qp_iters=self.qp_iters)
        return sqp_solve_batched(self.spec, states.xg, states.ug, xs, scheds,
                                 max_iters=self.rti_iters,
                                 qp_iters=self.qp_iters)

    def check_state_traj(self, xs) -> jax.Array:
        """Reference checkStateConstraints on a trajectory: bounds on all
        nodes, collision on node 0 only (see module docstring)."""
        ok = jnp.all(jax.vmap(self.model.check_state_bounds)(xs))
        return jnp.logical_and(ok, self.model.check_collision(xs[0]))

    def check_guess(self, xs, us) -> jax.Array:
        """Reference checkGuess (controller.py:255-258; STWA adds the
        terminal safe-set membership, controller.py:369-373): running
        constraints + dynamics consistency + per-node collision."""
        ok = self.check_state_traj(xs)
        taus = jax.vmap(self.model.tau)(xs[:-1], us)
        ok = jnp.logical_and(ok, jnp.all(self.model.check_torque_bounds(taus)))
        ok = jnp.logical_and(ok, self.model.check_dynamics(xs, us))
        ok = jnp.logical_and(
            ok, jnp.all(jax.vmap(self.model.check_collision)(xs)))
        if self.uses_safe_set and self.with_abort:
            ok = jnp.logical_and(ok, self.safe_set.check(xs[-1]))
        return ok

    def check_safe_nodes(self, xs, sched) -> jax.Array:
        """(N+1,) bool: safe-set membership of each node (fixed alpha)."""
        if self.safe_set is None:
            return jnp.ones(xs.shape[0], bool)
        return jax.vmap(lambda x: self.safe_set.check(x, sched.alpha))(xs)

    def provide_control(self, state: ControllerState, res: SolveResult,
                        accept) -> tuple[jax.Array, ControllerState]:
        """Accept-or-rollback + shift-by-one warm start
        (controller.py:169-184): on failure replay the shifted old guess."""
        u_ok = res.us[0]
        u_bad = state.ug[0]
        xs = jnp.where(accept, res.xs, state.xg)
        us = jnp.where(accept, res.us, state.ug)
        xg = jnp.roll(xs, -1, axis=0).at[-1].set(xs[-1])
        ug = jnp.roll(us, -1, axis=0).at[-1].set(us[-1])
        u = jnp.where(accept, u_ok, u_bad)
        return u, dataclasses.replace(state, xg=xg, ug=ug)

    # ------------------------------------------------------------ step

    def _accept(self, state, res) -> jax.Array:
        """Solve acceptance criterion; naive family: status only
        (controller.py:278-283)."""
        return res.status == 0

    def _post_step(self, state: ControllerState, sched,
                   res: SolveResult) -> StepResult:
        """Per-problem tick logic after the solve (acceptance, counters,
        warm-start shift) — shared by `step` and `step_batched`."""
        ok = self._accept(state, res)
        fails = jnp.where(ok, 0, state.fails + 1).astype(jnp.int32)
        state = dataclasses.replace(state, fails=fails,
                                    last_status=res.status,
                                    current_step=state.current_step + 1)
        u, state = self.provide_control(state, res, fails == 0)
        return StepResult(u=u, abort=jnp.asarray(False), state=state,
                          status=res.status, x_temp=res.xs, u_temp=res.us)

    def _advance_guide(self, state: ControllerState) -> ControllerState:
        """Advance the guidance-plan pointer one node per tick (no-op
        when guidance is off or the plan is a static point)."""
        if self.guide_len <= 1:
            return state
        return dataclasses.replace(
            state,
            plan_ptr=state.plan_ptr + state.guide_on.astype(jnp.int32))

    def step(self, state: ControllerState, x) -> StepResult:
        state = self.guess_correction(state)
        sched = self.schedule(state)
        state = self._advance_guide(state)
        res = self.solve(state, x, sched)
        return self._post_step(state, sched, res)

    def step_batched(self, states: ControllerState, xs) -> StepResult:
        """Whole-batch tick: per-problem schedules vmapped from the state
        machines, ONE lane-packed linearization + QP for the batch, then
        the per-problem post logic vmapped back over the solution. Exactly
        equivalent to `vmap(step)` (pinned by tests/test_controllers.py)
        but ~2-4x faster on TPU — the simulator's hot path."""
        states = jax.vmap(self.guess_correction)(states)
        scheds = jax.vmap(self.schedule)(states)
        states = jax.vmap(self._advance_guide)(states)
        res = self.solve_batched(states, xs, scheds)
        return jax.vmap(self._post_step)(states, scheds, res)

    def step_batched_warm(self, states: ControllerState, xs, warm):
        """`step_batched` with the cross-tick interior-point warm start
        (ops.qp.IPWarm): the previous tick's IP state re-enters the QP on
        a short barrier schedule — the closed-loop configuration the
        headline bench measures (HPIPM warm-starts the same way inside
        acados' RTI loop). Only valid for the single-RTI-iteration path
        (rti_iters <= 1). Returns (StepResult, warm_out); the caller
        shifts warm_out alongside the guess (ops.qp.shift_warm)."""
        from ..ops.sqp import rti_step_batched as _rti
        states = jax.vmap(self.guess_correction)(states)
        scheds = jax.vmap(self.schedule)(states)
        states = jax.vmap(self._advance_guide)(states)
        res, warm_out = _rti(self.spec, states.xg, states.ug, xs, scheds,
                             qp_iters=self.qp_iters, warm=warm,
                             with_warm=True)
        return jax.vmap(self._post_step)(states, scheds, res), warm_out


class TerminalZeroVelocity(MPCController):
    """Naive + terminal zero-velocity box (controller.py:295-317)."""
    name = "zerovel"
    terminal_zero_vel = True


class STController(MPCController):
    """Soft terminal safe-set constraint (controller.py:319-361)."""
    name = "st"
    uses_safe_set = True
    soft_terminal_set = True


class STWAController(STController):
    """ST with abort: viable-state capture + N-1-fails abort
    (controller.py:364-393)."""
    name = "stwa"
    with_abort = True

    def _accept(self, state, res):
        return jnp.logical_and(res.status == 0, self.check_state_traj(res.xs))

    def _post_step(self, state: ControllerState, sched,
                   res: SolveResult) -> StepResult:
        ok = self._accept(state, res)

        # on first failure capture x_guess[-2] as viable (controller.py:382)
        first_fail = jnp.logical_and(~ok, state.fails == 0)
        x_viable = jnp.where(first_fail, state.xg[-2], state.x_viable)
        # abort when the failure streak reaches N-1 (controller.py:384):
        abort = jnp.logical_and(~ok, state.fails == self.N - 1)
        fails = jnp.where(ok, 0, state.fails + 1).astype(jnp.int32)

        state_upd = dataclasses.replace(
            state, fails=fails, x_viable=x_viable, last_status=res.status,
            current_step=state.current_step + 1)
        u, state_shifted = self.provide_control(state_upd, res, ok)

        # an aborting tick returns u_guess[0] and does NOT shift the guess
        # or advance the step counter (controller.py:385)
        state_out = _tree_where(
            abort,
            dataclasses.replace(state, x_viable=x_viable,
                                last_status=res.status),
            state_shifted)
        u = jnp.where(abort, state.ug[0], u)
        return StepResult(u=u, abort=abort, state=state_out,
                          status=res.status, x_temp=res.xs, u_temp=res.us)


class HTWAController(STWAController):
    """Hard terminal safe set with abort (controller.py:396-401)."""
    name = "htwa"
    soft_terminal_set = False
    hard_terminal_set = True


class RecedingController(HTWAController):
    """Receding-constraint controller (controller.py:404-502): hard running
    safe-set row active only at node r (p-gated), soft terminal with ws_t."""
    name = "receding"
    running_set = True

    def schedule(self, state: ControllerState) -> NodeSchedule:
        sched = super().schedule(state)   # terminal hard from HTWA
        N = self.N
        dtype = state.xg.dtype
        cfg = self.cfg
        idx = jnp.arange(N + 1)
        # terminal: soft with runtime weight ws_t (controller.py:461-463)
        active = jnp.zeros(N + 1, dtype).at[N].set(1.0)
        soft = jnp.zeros(N + 1, dtype).at[N].set(1.0)
        zl = jnp.zeros(N + 1, dtype).at[N].set(cfg.ws_t)
        # receding node r: hard running constraint (controller.py:466-469)
        on_r = jnp.logical_and(idx == state.r, state.r < N)
        active = jnp.where(on_r, 1.0, active)
        return dataclasses.replace(sched, safe_active=active, safe_soft=soft,
                                   safe_zl=zl, safe_zu=zl)

    def _update_r_from_temp(self, r, xs, sched):
        """r <- (max i in [r+2, N] with x_temp[i] safe) - 1
        (controller.py:491-493)."""
        idx = jnp.arange(self.N + 1)
        safe_ok = self.check_safe_nodes(xs, sched)
        mask = jnp.logical_and(idx >= r + 2, safe_ok)
        best = jnp.max(jnp.where(mask, idx, -1))
        return jnp.where(best >= 0, best - 1, r).astype(jnp.int32)

    def _post_step(self, state: ControllerState, sched,
                   res: SolveResult) -> StepResult:
        abort_flag = self.cfg.abort_flag
        r = state.r - 1 if abort_flag else jnp.maximum(state.r - 1, 0)
        r = r.astype(jnp.int32)

        # r == 0 with abort enabled -> viable state is x_guess[1], reset r=N
        # and return u_guess[0] without shifting (controller.py:483-487)
        abort = jnp.logical_and(jnp.asarray(abort_flag), r == 0)

        ok = jnp.logical_and(res.status == 0, self.check_state_traj(res.xs))
        r_adv = self._update_r_from_temp(r, res.xs, sched)
        r_new = jnp.where(ok, r_adv, r)
        fails = jnp.where(ok, 0, state.fails + 1).astype(jnp.int32)

        state_upd = dataclasses.replace(
            state, fails=fails, r=r_new, last_status=res.status,
            current_step=state.current_step + 1)
        u, state_shifted = self.provide_control(state_upd, res, ok)

        state_abort = dataclasses.replace(
            state, x_viable=state.xg[1], r=jnp.asarray(self.N, jnp.int32),
            last_status=res.status)
        state_out = _tree_where(abort, state_abort, state_shifted)
        u = jnp.where(abort, state.ug[0], u)
        return StepResult(u=u, abort=abort, state=state_out,
                          status=res.status, x_temp=res.xs, u_temp=res.us)


class RealReceding(RecedingController):
    """Receding via pinned state instead of a safe-set running row
    (controller.py:504-565): node r box bounds squeeze to the previous
    guess +-1e-3; terminal safe set hard... (soft via ws_t at runtime)."""
    name = "real_receding"
    skip_guess_correction = True

    def schedule(self, state: ControllerState) -> NodeSchedule:
        # terminal soft-with-ws_t as in Receding, but NO running safe row
        sched = MPCController.schedule(self, state)
        N = self.N
        dtype = state.xg.dtype
        cfg = self.cfg
        active = jnp.zeros(N + 1, dtype).at[N].set(1.0)
        soft = jnp.zeros(N + 1, dtype).at[N].set(1.0)
        zl = jnp.zeros(N + 1, dtype).at[N].set(cfg.ws_t)
        sched = dataclasses.replace(sched, safe_active=active, safe_soft=soft,
                                    safe_zl=zl, safe_zu=zl)
        # pin node r to x_guess[r+1] +- 1e-3 (controller.py:530-532)
        idx = jnp.arange(N + 1)[:, None]
        pin = jnp.logical_and(idx == state.r, state.r < N)
        xg_next = jnp.roll(state.xg, -1, axis=0)      # row r -> xg[r+1]
        lbx = jnp.where(pin, xg_next - 1e-3, sched.lbx)
        ubx = jnp.where(pin, xg_next + 1e-3, sched.ubx)
        return dataclasses.replace(sched, lbx=lbx, ubx=ubx)


class ParallelController(RecedingController):
    """Per tick, solve one OCP per candidate constraint node n = N..1 and
    keep the solution with the largest verified safe node
    (controller.py:567-644). The reference executes the N solves serially;
    here they are one extra vmapped axis — the TPU-native realization of
    the algorithm's parallelism (SURVEY.md §2.3)."""
    name = "parallel"
    hard_terminal_set = True
    soft_terminal_set = False

    def _schedule_for_n(self, state: ControllerState, n) -> NodeSchedule:
        sched = MPCController.schedule(self, state)
        N = self.N
        dtype = state.xg.dtype
        idx = jnp.arange(N + 1)
        active = jnp.where(idx == n, 1.0, 0.0).astype(dtype)
        return dataclasses.replace(
            sched, safe_active=active,
            safe_soft=jnp.zeros(N + 1, dtype),
            safe_zl=jnp.zeros(N + 1, dtype), safe_zu=jnp.zeros(N + 1, dtype))

    def _post_parallel(self, state: ControllerState, ress: SolveResult,
                       scheds) -> StepResult:
        """Candidate scoring + selection + state machine, per problem;
        `ress`/`scheds` carry a leading candidate axis (n = N..1)."""
        N = self.N
        cands = jnp.arange(N, 0, -1)                  # n = N..1

        def score(n, res, sched):
            safe_ok = self.check_safe_nodes(res.xs, sched)
            idx = jnp.arange(N + 1)
            mask = jnp.logical_and(idx >= state.r, safe_ok)
            checked_r = jnp.maximum(jnp.max(jnp.where(mask, idx, 0)), 0)
            cv = jnp.where(checked_r >= state.r, checked_r,
                           jnp.minimum(n, state.r))
            success = jnp.logical_and(
                jnp.logical_and(res.status == 0, cv - state.r >= 0),
                self.check_state_traj(res.xs))
            return jnp.where(success, cv, 0).astype(jnp.int32)

        results = jax.vmap(score)(cands, ress, scheds)
        best_i = jnp.argmax(results)                  # ties -> largest n
        node_success = results[best_i]
        res = jax.tree.map(lambda a: a[best_i], ress)

        succ = node_success > 1
        fails = jnp.where(succ, 0, state.fails + 1).astype(jnp.int32)
        abort = jnp.logical_and(~succ, state.r == 1)
        r_new = jnp.where(succ, node_success, state.r) - 1

        state_upd = dataclasses.replace(
            state, fails=fails, r=r_new.astype(jnp.int32),
            last_status=res.status, current_step=state.current_step + 1)
        u, state_shifted = self.provide_control(state_upd, res, succ)

        state_abort = dataclasses.replace(
            state, x_viable=state.xg[1], r=jnp.asarray(self.N, jnp.int32),
            last_status=res.status)
        state_out = _tree_where(abort, state_abort, state_shifted)
        u = jnp.where(abort, state.ug[0], u)
        return StepResult(u=u, abort=abort, state=state_out,
                          status=res.status, x_temp=res.xs, u_temp=res.us)

    def step(self, state: ControllerState, x) -> StepResult:
        state = self.guess_correction(state)
        cands = jnp.arange(self.N, 0, -1)             # n = N..1
        scheds = jax.vmap(lambda n: self._schedule_for_n(state, n))(cands)
        state = self._advance_guide(state)
        ress = jax.vmap(lambda sched: self.solve(state, x, sched))(scheds)
        return self._post_parallel(state, ress, scheds)

    def step_batched(self, states: ControllerState, xs) -> StepResult:
        """All B problems x N candidate nodes as ONE lane-packed QP batch
        of size B*N — the full realization of the algorithm's parallelism
        (the reference runs the N candidate solves serially per problem,
        controller.py:598-612)."""
        states = jax.vmap(self.guess_correction)(states)
        B, Nc = xs.shape[0], self.N
        cands = jnp.arange(Nc, 0, -1)
        scheds = jax.vmap(lambda s: jax.vmap(
            lambda n: self._schedule_for_n(s, n))(cands))(states)
        states = jax.vmap(self._advance_guide)(states)
        flat = lambda a: a.reshape((B * Nc,) + a.shape[2:])
        scheds_f = jax.tree.map(flat, scheds)
        states_f = jax.tree.map(lambda a: jnp.repeat(a, Nc, axis=0), states)
        xs_f = jnp.repeat(xs, Nc, axis=0)
        res_f = self.solve_batched(states_f, xs_f, scheds_f)
        unflat = lambda a: a.reshape((B, Nc) + a.shape[1:])
        ress = jax.tree.map(unflat, res_f)
        scheds_c = jax.tree.map(lambda a: a.reshape((B, Nc) + a.shape[2:]),
                                scheds)
        return jax.vmap(self._post_parallel)(states, ress, scheds_c)


class SafeSetEverywhere(STController):
    """Hard safe-set rows at every node 1..N (controller.py:646-689)."""
    name = "constraint_everywhere"
    soft_terminal_set = False

    def schedule(self, state: ControllerState) -> NodeSchedule:
        sched = MPCController.schedule(self, state)
        dtype = state.xg.dtype
        active = jnp.ones(self.N + 1, dtype).at[0].set(0.0)
        return dataclasses.replace(
            sched, safe_active=active,
            safe_soft=jnp.zeros(self.N + 1, dtype),
            safe_zl=jnp.zeros(self.N + 1, dtype),
            safe_zu=jnp.zeros(self.N + 1, dtype))

    def _accept(self, state, res):
        return jnp.logical_and(res.status == 0, self.check_state_traj(res.xs))


class SafeBackupController(MPCController):
    """The abort solver (controller.py:692-712): brake to zero terminal
    velocity. Objective: the reference's SafeAbortOCP velocity penalty
    (ocp.py:291-303) instead of mpc.py's ZeroCost, whose zero Hessian is
    singular; the solution set (braking trajectories) is the same."""
    name = "backup"
    terminal_zero_vel = True

    def __init__(self, model, N=None, **kw):
        N = int(N if N is not None else model.cfg.back_hor)
        kw.setdefault("vel_penalty", 1e4)
        kw.setdefault("lm", 0.0)
        super().__init__(model, N=N, **kw)

    def solve_backup(self, x_viable, max_iters: int = 20):
        """Full-SQP braking solve from a viable state (budget 20 iters,
        controller.py:712) with a constant cold-start guess (mpc.py:174-176)."""
        N = self.N
        xg = jnp.tile(x_viable, (N + 1, 1))
        ug = jnp.zeros((N, self.model.nu), x_viable.dtype)
        sched = self.schedule(self.initial_state(x_viable))
        return sqp_solve(self.spec, xg, ug, x_viable, sched,
                         max_iters=max_iters, qp_iters=self.qp_iters)

    def solve_backup_batched(self, x_viables, max_iters: int = 20):
        """Whole-batch braking solves on the batch-last SQP (same cold
        start and budget as :meth:`solve_backup`, pinned by tests)."""
        B = x_viables.shape[0]
        N = self.N
        xg = jnp.tile(x_viables[:, None], (1, N + 1, 1))
        ug = jnp.zeros((B, N, self.model.nu), x_viables.dtype)
        scheds = jax.vmap(
            lambda x: self.schedule(self.initial_state(x)))(x_viables)
        return sqp_solve_batched(self.spec, xg, ug, x_viables, scheds,
                                 max_iters=max_iters, qp_iters=self.qp_iters)
