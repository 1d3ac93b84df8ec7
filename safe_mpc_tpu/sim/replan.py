"""Event-triggered long-horizon replanning for stalled closed loops.

The receding MPC's N-step OCP has genuine local minima behind the cage
obstacles: from some starts the loop wedges at ~5 cm EE error and full
SQP at the SAME horizon cannot improve (measured, scripts_dev/
diag_escape.py). Two measured escape mechanisms, applied between sim
segments (host-side, so the per-segment compiled program is unchanged):

1. a LONG-horizon OCP (N_replan >> N) cold-started from the shifted
   guess escapes shallow wedges (5-9 cm -> sub-mm terminal error), and
2. for deep wedges, the same OCP seeded with a joint-space
   IK-interpolation guess (smooth cosine path from the stalled q to a
   multistart IK solution of the target; the SQP repairs collisions)
   finds routes the cold start cannot.

A problem is "stalled" when it is still running, its EE error exceeds
tol_conv, and the error improved less than `progress_tol` since the
last check. Accepted replans (feasible and terminal error materially
better) splice their first N nodes into the controller state as a fresh
guess (reference setGuess semantics, controller.py:390-393); everything
downstream — RTI ticks, abort machinery, outcome classification — is
untouched. This generalizes the reference's offline guess stage
(guess_acados.py) to an online, event-triggered form; the controller
itself never changes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..controllers.base import MPCController
from ..ops.sqp import sqp_solve_batched
from ..tasks.ik import solve_ik_diverse
from .closed_loop import MODE_MPC, SimState, _tree_where_b


def pd_path_guess(model, x0s, q_pick, N, dt=None, via_q=None):
    """DYNAMICS-CONSISTENT joint-path guess: a PD controller tracks a
    cosine joint path from each x0 to its target configuration through
    the true double integrator, so the guess has ZERO dynamics defects.
    (A purely kinematic guess carries O(1) defects, and with
    merit_rho = 1e4 the f32 L1 merit saturates its ~7 significant
    digits — measured: the same seeds solve in f64 and fail in f32
    until the defects are removed.)

    `via_q` builds a retreat-then-reapproach path: first half retreats
    to `via_q` (pulling the arm out of the obstacle cage), second half
    reaches the target — the deep 5-11 cm wedges are states a direct
    path cannot leave without first backing out.

    Returns (xs, us) as float32/x0 dtype numpy arrays, shapes
    (B, N+1, nx) / (B, N, nu)."""
    nq = model.nq
    dt = model.cfg.dt if dt is None else dt
    x0s = np.asarray(x0s)
    pick = np.asarray(q_pick)
    if via_q is not None:
        h = N // 2
        t1 = 0.5 * (1 - np.cos(np.linspace(0.0, np.pi, h + 1)))
        t2 = 0.5 * (1 - np.cos(np.linspace(0.0, np.pi, N - h + 1)))
        via = np.asarray(via_q)[None, None]
        seg1 = x0s[:, None, :nq] + t1[None, :, None] * (
            via - x0s[:, None, :nq])
        seg2 = via + t2[None, :, None] * (pick[:, None, :nq] - via)
        q_ref = np.concatenate([seg1, seg2[:, 1:]], axis=1)
    else:
        t = 0.5 * (1 - np.cos(np.linspace(0.0, np.pi, N + 1)))
        q_ref = x0s[:, None, :nq] \
            + t[None, :, None] * (pick[:, None, :nq] - x0s[:, None, :nq])
    v_ref = np.gradient(q_ref, dt, axis=1)
    B = x0s.shape[0]
    xs = np.zeros((B, N + 1, 2 * nq), np.float32)
    us = np.zeros((B, N, nq), np.float32)
    xs[:, 0] = x0s
    for k in range(N):
        q, v = xs[:, k, :nq], xs[:, k, nq:]
        a_ff = (v_ref[:, k + 1] - v_ref[:, k]) / dt if k + 1 < N else 0.0
        u = np.clip(a_ff + 400.0 * (q_ref[:, k] - q)
                    + 40.0 * (v_ref[:, k] - v), -40.0, 40.0)
        us[:, k] = u
        xs[:, k + 1, :nq] = q + dt * v + 0.5 * dt * dt * u
        xs[:, k + 1, nq:] = v + dt * u
    return xs, us


# per-problem machinery modes (host-side; the sim's MODE_MPC/ABORT/DONE
# is a separate, device-side machine)
PMODE_TRACK = 0     # greedy toward the task reference, no active plan
PMODE_PLAN = 1      # tracking an accepted long-horizon plan (guidance on)
PMODE_HELD = 2      # parked at pose awaiting an f64 escape job
PMODE_FINI = 3      # a certified finisher guess was spliced (terminal
#                     for the stall/brake/park machinery)


class StallReplanner:
    """Host-side stall detector + batched long-horizon replanner.

    Every problem carries ONE machinery mode (`self.pmode`,
    PMODE_TRACK/PLAN/HELD/FINI). The transition table — each row is the
    only place that transition happens:

    | from  | to    | trigger (hook phase)                               |
    |-------|-------|----------------------------------------------------|
    | TRACK | PLAN  | stall replan accepted (splice/guidance), or an     |
    |       |       | f64 harvest splice for a non-held problem          |
    | TRACK | HELD  | seed plan ends in a wedge / no accepted seed →     |
    |       |       | park + f64 job (seed_plans), or a stall-path f64   |
    |       |       | launch (parked so the harvest staleness check      |
    |       |       | passes — round-4 run-1 fix)                        |
    | TRACK | FINI  | finisher solve certified (< 0.5·tol) and spliced   |
    | PLAN  | TRACK | plan consumed / target near (handover), or the     |
    |       |       | loop fell off the plan (feeds stall detection)     |
    | HELD  | TRACK | f64 harvest returned without an acceptable plan,   |
    |       |       | or hold timeout (worker killed at f64_wait_s)      |
    | HELD  | PLAN  | f64 harvest spliced an accepted plan               |
    | FINI  | FINI  | terminal for brake/park/stall; the finisher may    |
    |       |       | RE-certify while unconverged (finish_tries-capped) |

    Invariants (tests/test_replan_modes.py): a FINI problem is never
    braked, parked, or stall-replanned (a certified splice must not be
    overwritten — round-3 root cause of lost near-misses); a HELD
    problem is excluded from every other phase until its harvest.

    Parameters
    ----------
    replan_ctrl : a long-horizon controller (typically the guess variant
        of the closed-loop controller, ``get_guess_controller(name,
        model, N=replan_N)``) whose spec defines the replan OCP.
    target_ctrl : the closed-loop controller (for horizon N and set_guess
        semantics).
    chunk : stalled problems are replanned in padded chunks of this size
        (one compiled program, reused; keeps TPU program size bounded).
    """

    def __init__(self, replan_ctrl: MPCController,
                 target_ctrl: MPCController,
                 progress_tol: float = 2e-3, chunk: int = 16,
                 ik_starts: int = 32, ik_seeds: int = 4,
                 sqp_iters: int = 150, qp_iters: int = 40,
                 accept_margin: float = 5e-3,
                 library: str | dict | None = None):
        self.replan = replan_ctrl
        self.ctrl = target_ctrl
        self.model = replan_ctrl.model
        self.progress_tol = float(progress_tol)
        self.chunk = int(chunk)
        self.sqp_iters = int(sqp_iters)
        self.qp_iters = int(qp_iters)
        self.accept_margin = float(accept_margin)
        # f64 escape jobs solve at a LONGER horizon than the on-TPU
        # replans: the round-4 wedge ground truth (scripts_dev/
        # wedge_ground_truth.py, data_noise/wedge_ground_truth.json)
        # shows ALL 14 round-3 wedge states have feasible N=320 f64
        # escapes landing 0.14-3.6 mm out, including one (p57, 174 mm)
        # that N=320 solves from a plain hold guess where N=240 failed.
        self.f64_N = 320
        # OFFLINE PLAN LIBRARY (apps/plan_library.py; VERDICT r4 task 1):
        # per problem, the best N=320/480 f64 plan from the full anchor
        # menu, pre-solved at guess time. The round-4 evidence: f64
        # escapes spliced at t=0 won 24/24, mid-episode launches 0/8 —
        # the online chain was episode-clock starved. seed_plans splices
        # library plans first; stalled problems re-attach to the nearest
        # library plan node; the f64 subprocess machinery stays as a
        # fallback for states no library plan passes near.
        self.library: dict | None = None
        self.lib_attach_tries: np.ndarray | None = None
        self.lib_attach_max = 2
        self.lib_attach_tol = 0.05   # = the f64-harvest staleness gate
        lib_len = 0
        if library is not None:
            self.load_library(library)
            lib_len = int(np.max(self.library["length"]))
        # timed-plan guidance: the controller's guidance buffer holds the
        # FULL plan EE path (padded with its end point for shorter
        # plans); each MPC node tracks its own plan node and the pointer
        # advances one node per tick (controllers/base.py _traj_window /
        # _advance_guide). MUST be set before the sim's initial_state
        # sizes the ControllerState buffers.
        self.plan_len = max(replan_ctrl.N, self.f64_N, lib_len) + 1
        target_ctrl.guide_len = self.plan_len
        self.prev_err: np.ndarray | None = None
        self.n_replans = 0
        self.n_accepted = 0
        self.n_brakes = 0
        # per-problem event journal (diagnosability: which machinery
        # touched which problem when — round-4 censuses had to be
        # reverse-engineered from aggregate log lines). apps/mpc.py
        # dumps it as <artifact>_events.json next to the pickle.
        self.events: list[dict] = []
        # per-problem plan store (lazily sized to the batch)
        self.plan_ee: np.ndarray | None = None
        self.plan_ptr: np.ndarray | None = None
        # the per-problem machinery mode (see class docstring); lazily
        # sized to the batch in _ensure_plan_store
        self.pmode: np.ndarray | None = None

        # IK anchors of the (shared) target, computed once: PAIRWISE
        # -DISTINCT arm branches reaching ee_ref — the deep wedges are
        # arm-configuration traps, so each replan round seeds a
        # different branch (round-robin below)
        model = self.model
        sols = solve_ik_diverse(model, jnp.asarray(model.ee_ref),
                                n_anchors=max(2, ik_seeds),
                                n_starts=max(ik_starts, 64))
        self.q_iks = sols if len(sols) else None
        self.round = 0
        self._solve = jax.jit(lambda xg, ug, x0s: self._solve_impl(
            self.replan, xg, ug, x0s))
        # escape spec WITHOUT safe-set rows (collision/torque/bounds
        # only): measured, the NN safe rows block the branch-swap
        # detours in f32 that the bare spec solves; the closed-loop MPC
        # keeps its own full constraint stack regardless
        self._escape_ctrl = MPCController(self.model, N=replan_ctrl.N,
                                          lm=1e-3)
        self._solve_esc = jax.jit(lambda xg, ug, x0s: self._solve_impl(
            self._escape_ctrl, xg, ug, x0s))
        # near-miss FINISHER: a full-SQP solve at the MPC horizon from
        # the current near-target state. The N_replan stall replan can
        # NEVER accept a near-miss — accept_margin (5 mm) exceeds the
        # remaining error — and the terminal brake parks the arm where
        # it is, just OFF target (measured flagship round 6: 21/49
        # failures ended 1-15 mm out, 15 of them at 1-3.7 mm). Bare
        # spec like the escape ctrl: the closed-loop MPC enforces its
        # own constraint stack regardless, and the finisher's terminal
        # state is rest-at-target.
        self._fin_ctrl = MPCController(self.model, N=target_ctrl.N,
                                       lm=1e-3, Q=10.0 * self.model.cfg.Q_weight)
        self._solve_fin = jax.jit(lambda xg, ug, x0s: self._solve_impl(
            self._fin_ctrl, xg, ug, x0s))
        # 2.5 cm: measured reach of the N=45 finisher (a 17 mm start
        # certifies at 0.14 mm; the 5 cm wedge band is beyond it)
        self.finish_tol = 2.5e-2
        self.n_finishes = 0
        # finisher backoff: consecutive non-certified finisher solves per
        # problem (a collision-adjacent near-miss the finisher can never
        # certify would otherwise re-fire its 60-iter SQP every segment);
        # after `finish_max_tries` consecutive misses the problem is
        # skipped, a certified splice resets the count
        self.finish_max_tries = 6
        self.finish_tries: np.ndarray | None = None
        # asynchronous f64 escape solves for deep wedges (escape_f64.py).
        # f64_after=1: the wedges are genuine local minima of even the
        # N=240 f32 OCP (round-3 diag: the cold-hold escape re-converges
        # to them exactly), so waiting for repeat on-device failures just
        # burns episode steps — launch after the FIRST failed round. Each
        # job stacks TWO guesses per problem (branch-swap anchor direct +
        # via home); the harvest keeps the best per problem. Measured on
        # the round-3 flagship wedge census: the branch-swap guess moves
        # ALL 16 wedged problems to <= 22 mm (7 straight to 2.6 mm), and
        # the finisher/lm-drop machinery converts the rest from there.
        self.use_f64 = True
        self.f64_after = 1
        self.f64_sqp_iters = 60
        # deterministic harvest (VERDICT r3 weak #4): each job BLOCKS at
        # its due hook (launch + f64_due_rounds) instead of being polled
        # opportunistically, so the same command yields the same conv
        # count — subprocess wall-clock timing no longer decides which
        # wedges get their splice. A job that exceeds f64_wait_s at its
        # due hook is killed and harvested as failed (a hung worker must
        # not park its problems for the episode, ADVICE r3 medium).
        self.deterministic = True
        # 2 hooks (~200 steps) job latency: run-1 census showed due=3
        # left mid-episode wedges (entered ~step 400-500) harvesting at
        # 700 with no runway for the 320-step escape; one 6-problem job
        # takes ~900 s and a segment runs ~500 s, so 2 hooks suffice
        self.f64_due_rounds = 2
        self.f64_wait_s = 1800.0
        # several SMALL concurrent jobs beat one big one: an XLA CPU
        # batched SQP runs essentially single-core (the per-step tensors
        # are too small to multithread), so job latency scales with B
        # while extra jobs ride idle cores (measured: B=16 ~600 s vs
        # B=32 ~1100 s; 3 concurrent jobs ~ the price of one)
        self.f64_chunk = 6                # problems per job (cap)
        self.f64_max_jobs = 4             # concurrent subprocesses
        self.stall_rounds: np.ndarray | None = None
        self._f64_jobs: list = []
        self._hooks_left = 99
        self.n_f64 = 0
        self.n_f64_accepted = 0
        # "park until the planner returns": problems whose seed plan ends
        # in a wedge (or had no accepted seed) HOLD at their current pose
        # under static guidance while their f64 job runs — transiting
        # into the wedge both wastes episode steps and invalidates the
        # job's x0 (the harvest staleness check). Cleared at harvest, or
        # after `hold_max_rounds` hooks without one (a starved/crashed
        # worker must not park problems for the rest of the episode —
        # flagship attempt 3 lost 64 problems that way).
        # backstop only: deterministic harvest releases holds at the due
        # hook (or kills the worker at f64_wait_s), so the timeout just
        # guards the non-deterministic mode. 4 rounds IS reachable
        # within the flagship's 7-hook budget (ADVICE r3 medium: the old
        # value 8 was not).
        self.hold_rounds: np.ndarray | None = None
        self.hold_max_rounds = 4

    # ------------------------------------------------------------- modes

    @property
    def plan_active(self):
        """Derived view: problems currently tracking an accepted plan."""
        return self.pmode == PMODE_PLAN

    @property
    def hold_for_f64(self):
        """Derived view: problems parked awaiting an f64 job."""
        return self.pmode == PMODE_HELD

    def _to_track(self, sel):
        """-> TRACK, except FINI rows (terminal for this machinery)."""
        m = self.pmode[sel]
        self.pmode[sel] = np.where(m == PMODE_FINI, m, PMODE_TRACK)

    def _ev(self, kind: str, sel=None, **kw):
        """Append one journal event (see ``self.events``). Non-finite
        floats become None — the journal is dumped as strict JSON and
        the default NaN/Infinity tokens break standard parsers
        (ADVICE r4)."""
        def clean(v):
            if isinstance(v, list):
                return [clean(x) for x in v]
            if isinstance(v, float) and not np.isfinite(v):
                return None
            return v
        e = {"round": int(self.round), "kind": kind}
        if sel is not None:
            e["problems"] = np.atleast_1d(np.asarray(sel)).astype(int).tolist()
        for k, v in kw.items():
            if isinstance(v, np.ndarray):
                v = np.round(v.astype(float), 4).tolist()
            e[k] = clean(v)
        self.events.append(e)

    # ------------------------------------------------------------- guesses

    def _ik_guess(self, x0s, anchor: int | None = None,
                  via: bool = False, N: int | None = None):
        """Branch-swap guess to an IK anchor (see :func:`pd_path_guess`):
        ``anchor=None`` picks the nearest anchor per problem, an int picks
        the round-robin branch, and ``via=True`` retreats through the
        mid-range home posture first (deep-wedge escape, flagship round-6
        failure census). `N` defaults to the on-TPU replan horizon;
        f64 jobs pass f64_N."""
        model = self.model
        nq = model.nq
        N = self.replan.N if N is None else int(N)
        x0s = np.asarray(x0s)
        if anchor is None:
            d = np.linalg.norm(x0s[:, None, :nq] - self.q_iks[None, :, :nq],
                               axis=2)
            pick = self.q_iks[np.argmin(d, axis=1)]      # (B, nx)
        else:
            idx = np.asarray(anchor) % len(self.q_iks)
            if idx.ndim == 0:
                pick = np.tile(self.q_iks[int(idx)][None],
                               (x0s.shape[0], 1))
            else:                                        # per-problem anchor
                pick = self.q_iks[idx]
        via_q = 0.5 * (np.asarray(model.robot.q_min)
                       + np.asarray(model.robot.q_max)) if via else None
        xs, us = pd_path_guess(model, x0s, pick, N, via_q=via_q)
        dtype = jnp.asarray(x0s).dtype
        return jnp.asarray(xs, dtype), jnp.asarray(us, dtype)

    def _hold_guess(self, x0s, N: int | None = None):
        """Constant-state cold start (the reference's initializer shape)."""
        Nr = self.replan.N if N is None else int(N)
        xg = jnp.tile(x0s[:, None], (1, Nr + 1, 1))
        ug = jnp.zeros((x0s.shape[0], Nr, self.model.nu), x0s.dtype)
        return xg, ug

    # ------------------------------------------------------------- solving

    def _solve_impl(self, ctrl, xg, ug, x0s):
        sched = jax.vmap(lambda x: ctrl.schedule(
            ctrl.initial_state(x)))(x0s)
        res = sqp_solve_batched(ctrl.spec, xg, ug, x0s, sched,
                                max_iters=self.sqp_iters,
                                qp_iters=self.qp_iters)
        ee_T = jax.vmap(self.model.ee_pos)(res.xs[:, -1])
        errs = jnp.linalg.norm(
            ee_T - jnp.asarray(self.model.ee_ref, x0s.dtype)[None], axis=1)
        return res.xs, res.us, res.status, errs, res.qp_viol

    def _replan_chunk(self, x0s):
        """Returns (xs, us, feasible, err_T, viol), best over the cold
        -hold guess and three IK-branch guesses: nearest anchor, the
        round-robin branch (the rotation tries every distinct arm branch
        across replan rounds), and a retreat-via-home path to the next
        round-robin anchor (back out of the cage, then reapproach).
        "Best" prefers feasible plans, then lower
        terminal error; a NEAR-feasible plan that reaches the target is
        still kept (viol reported) because guidance is pure cost shaping
        — the closed-loop MPC enforces its own constraints."""
        best = None
        guesses = [(self._hold_guess(x0s), self._solve)]
        if self.q_iks is not None:
            guesses.append((self._ik_guess(x0s), self._solve))
            if len(self.q_iks) > 1:
                guesses.append((self._ik_guess(x0s, anchor=self.round),
                                self._solve_esc))
            # retreat-then-reapproach (same compiled escape program,
            # different data): back out to the home posture, then reach
            # the round-robin anchor — targets the deep cage wedges
            guesses.append((self._ik_guess(x0s, anchor=self.round + 1,
                                           via=True), self._solve_esc))
        for (xg, ug), solver in guesses:
            xs, us, status, errs, viol = solver(xg, ug, x0s)
            ok = status == 0
            cand = (xs, us, ok, errs, viol)
            if best is None:
                best = cand
            else:
                # feasible beats infeasible; ties break on terminal err
                better = jnp.logical_or(
                    jnp.logical_and(ok, ~best[2]),
                    jnp.logical_and(ok == best[2], errs < best[3]))
                best = tuple(
                    _tree_where_b(better, c, b) for c, b in
                    zip(cand, best))
        return best

    def _finish_and_splice(self, st: SimState, idx,
                           verbose: bool = False):
        """Batched finisher solves for near-miss problems; solutions
        that end within 0.5*tol_conv of the target splice in as fresh
        guesses (set_guess semantics), guidance OFF — the true task
        reference converges from a sub-mm warm start. Returns the
        updated state and the per-problem accepted mask."""
        model, N = self.model, self.ctrl.N
        B = st.x.shape[0]
        accepted = np.zeros(B, bool)
        tol = model.cfg.tol_conv
        xg_new = ug_new = None
        for a in range(0, idx.size, self.chunk):
            sel = idx[a:a + self.chunk]
            pad = self.chunk - sel.size
            sel_p = np.concatenate([sel, np.repeat(sel[:1], pad)])
            x0s = jnp.asarray(np.asarray(st.x)[sel_p])
            xs, us, status, errs, _ = self._solve_fin(
                *self._hold_guess(x0s, N=N), x0s)
            ok = (np.asarray(status) == 0)[:sel.size] \
                & (np.asarray(errs) < 0.5 * tol)[:sel.size]
            self._ev("finish", sel, err_T=np.asarray(errs)[:sel.size],
                     certified=ok.astype(int).tolist())
            if not ok.any():
                continue
            if xg_new is None:
                xg_new = np.asarray(st.ctrl.xg).copy()
                ug_new = np.asarray(st.ctrl.ug).copy()
            f_sel = sel[ok]
            accepted[f_sel] = True
            xg_new[f_sel] = np.asarray(xs[:sel.size])[ok]
            ug_new[f_sel] = np.asarray(us[:sel.size])[ok]
            if verbose:
                print(f"  finish: {int(ok.sum())}/{sel.size} spliced "
                      f"(err_T {np.round(np.asarray(errs)[:sel.size], 5)})",
                      flush=True)
        if accepted.any():
            self.n_finishes += int(accepted.sum())
            guide_on = np.asarray(st.ctrl.guide_on).copy()
            guide_on[accepted] = False
            # certified splice -> FINI: terminal for brake/park/stall
            # (round-3 root cause: later machinery overwrote it)
            self.pmode[accepted] = PMODE_FINI
            # same set_guess bookkeeping as _splice_plans (ADVICE r3):
            # reset the receding counter + fails streak and refresh
            # x_viable for the accepted rows — the old values refer to
            # the discarded guess (base.py:139-141, controller.py:390-393)
            acc_j = jnp.asarray(accepted)
            st = dataclasses.replace(st, ctrl=dataclasses.replace(
                st.ctrl, xg=jnp.asarray(xg_new), ug=jnp.asarray(ug_new),
                guide_on=jnp.asarray(guide_on),
                x_viable=jnp.where(acc_j[:, None], jnp.asarray(
                    xg_new[:, -1]), st.ctrl.x_viable),
                r=jnp.where(acc_j, jnp.asarray(self.ctrl.N,
                                               st.ctrl.r.dtype), st.ctrl.r),
                fails=jnp.where(acc_j, jnp.zeros_like(st.ctrl.fails),
                                st.ctrl.fails)))
        return st, accepted

    # ------------------------------------------------------- plan tracking

    def _ensure_plan_store(self, B):
        if self.plan_ee is None:
            self.plan_ee = np.zeros((B, self.plan_len, 3))
            self.plan_ptr = np.zeros(B, int)
        if self.pmode is None:
            self.pmode = np.full(B, PMODE_TRACK, int)
        if self.finish_tries is None:
            self.finish_tries = np.zeros(B, int)
        if self.stall_rounds is None:
            self.stall_rounds = np.zeros(B, int)
        if self.hold_rounds is None:
            self.hold_rounds = np.zeros(B, int)
        if self.lib_attach_tries is None:
            self.lib_attach_tries = np.zeros(B, int)

    def _update_guidance(self, st: SimState, ee, err):
        """Between-segment plan maintenance: re-time each active plan's
        pointer to the node nearest the ACTUAL end-effector (the in-jit
        pointer advances one node per tick, so the MPC may lag or lead
        the plan's clock), hand over to the true task reference when the
        plan is consumed or the target is close, and abandon plans the
        loop has fallen off (feeds the stall replanner)."""
        B = ee.shape[0]
        if not self.plan_active.any():
            return st, np.zeros(B, bool)
        ptr = np.asarray(st.ctrl.plan_ptr).copy()
        guide_on = np.asarray(st.ctrl.guide_on).copy()
        freshly_stalled = np.zeros(B, bool)
        handed_over = []
        T = self.plan_len - 1
        for i in np.flatnonzero(self.plan_active):
            d = np.linalg.norm(self.plan_ee[i] - ee[i][None], axis=1)
            # windowed nearest node (the EE path may pass near itself):
            # the true position is between the last re-time and the
            # pointer's tick count
            lo = max(0, min(int(ptr[i]), self.plan_ptr[i]) - 30)
            hi = min(T, int(ptr[i]) + 30)
            near = lo + int(np.argmin(d[lo:hi + 1]))
            if d[near] > 0.08:
                # fell off the plan -> abandon (PLAN -> TRACK); the
                # stall logic replans
                self.pmode[i] = PMODE_TRACK
                guide_on[i] = False
                freshly_stalled[i] = True
                continue
            if err[i] < 0.03 or d[T] < 0.03:
                # near the target (or the plan's end point reached):
                # hand over to the true task reference (PLAN -> TRACK)
                # — the greedy basin converges from here
                # (scripts_dev/diag_fixedpoint)
                self.pmode[i] = PMODE_TRACK
                guide_on[i] = False
                handed_over.append(int(i))
            else:
                ptr[i] = near
                self.plan_ptr[i] = near
        if np.any(freshly_stalled):
            self._ev("abandon", np.flatnonzero(freshly_stalled))
        if handed_over:
            self._ev("handover", handed_over)
        ctrl_new = dataclasses.replace(
            st.ctrl, plan_ptr=jnp.asarray(ptr, jnp.int32),
            guide_on=jnp.asarray(guide_on))
        return dataclasses.replace(st, ctrl=ctrl_new), freshly_stalled

    def _harvest_f64(self, st: SimState, err, verbose: bool = False,
                     final: bool = False):
        """Collect asynchronous f64 escape jobs and splice their plans
        for problems that are still roughly where the job left them (a
        wedged state is nearly stationary; the staleness check guards
        the exception).

        Deterministic mode: a job is harvested exactly at its due hook
        (BLOCKING on the worker if needed, killing it past f64_wait_s);
        earlier hooks leave it running untouched. `final=True` (the
        episode's last hook) blocks on everything in flight."""
        for job in list(self._f64_jobs):
            if self.deterministic:
                # a job without a schedule (legacy/test stub) is due now
                due_round = getattr(job, "due_round", -1)
                if not (final or due_round < 0 or self.round >= due_round):
                    continue
                if hasattr(job, "wait"):
                    if verbose and job.proc.poll() is None:
                        print(f"  f64 harvest: blocking on job for problems "
                              f"{np.unique(job.sel).tolist()}", flush=True)
                    out = job.wait(timeout=self.f64_wait_s)
                else:
                    out = job.poll()
                if out is None:
                    continue
            else:
                out = job.poll()
                if out is None:
                    continue
            self._f64_jobs.remove(job)
            st = self._harvest_one_f64(st, err, out, verbose)
        return st

    def _harvest_one_f64(self, st: SimState, err, out,
                         verbose: bool = False):
        sel, x0, xs, us, status, err_T, viol = out
        # release parked problems: HELD -> TRACK (accepted ones go
        # TRACK -> PLAN in the splice below; the rest resume the normal
        # stall machinery with guidance off)
        held = np.unique(sel)[self.hold_for_f64[np.unique(sel)]]
        if held.size:
            self._to_track(held)
            guide_on = np.asarray(st.ctrl.guide_on).copy()
            guide_on[held] = False
            st = dataclasses.replace(st, ctrl=dataclasses.replace(
                st.ctrl, guide_on=jnp.asarray(guide_on)))
        # best-per-problem over the stacked guesses: feasible first, then
        # lower terminal error (a job carries 2 candidate plans per
        # problem; duplicate sel rows would otherwise last-write-win)
        order = np.lexsort((err_T, status != 0))
        first = {}
        for i in order:
            first.setdefault(int(sel[i]), i)
        pick = np.fromiter(first.values(), dtype=int)
        sel, x0 = sel[pick], x0[pick]
        xs, us = xs[pick], us[pick]
        status, err_T, viol = status[pick], err_T[pick], viol[pick]
        fresh = np.max(np.abs(np.asarray(st.x)[sel] - x0), axis=1) < 0.05
        keep = fresh & np.isfinite(err_T)
        self._ev("f64_harvest", sel, err_T=np.asarray(err_T),
                 status=np.asarray(status).astype(int).tolist(),
                 stale=np.asarray(~fresh).astype(int).tolist())
        if not keep.any():
            return st
        sel, xs, us = sel[keep], xs[keep], us[keep]
        feas = (status[keep] == 0)
        st, acc = self._splice_plans(st, sel, xs, us, feas, err_T[keep],
                                     viol[keep], err[sel], verbose,
                                     tag="f64")
        self.n_f64_accepted += int(acc.sum())
        self.stall_rounds[sel[acc[sel]]] = 0
        return st

    def close(self):
        """Cancel any in-flight f64 escape subprocess (end of run)."""
        for job in self._f64_jobs:
            job.cancel()
        self._f64_jobs = []

    # ------------------------------------------------------------ library

    def load_library(self, library: str | dict):
        """Load an offline plan library (apps/plan_library.py npz: xs,
        us, length, status, err_T, viol, x0 — tail-padded to a common
        horizon) and precompute each plan's EE path."""
        if isinstance(library, (str, bytes)):
            library = dict(np.load(library, allow_pickle=False))
        lib = {k: np.array(v) for k, v in library.items()}
        # the npz stores plans tail-padded to a fixed N_PAD (480); trim
        # to the longest REAL plan so the guidance buffers (plan_len =
        # max real length + 1) and the splice shapes agree
        L = int(np.max(lib["length"]))
        lib["xs"] = lib["xs"][:, :L + 1]
        lib["us"] = lib["us"][:, :L]
        lib["ee"] = np.asarray(jax.vmap(jax.vmap(self.model.ee_pos))(
            jnp.asarray(lib["xs"], jnp.float32)))
        # usable plans: feasible and actually reaching the target — a
        # library row that missed is worse than the online machinery
        lib["good"] = (lib["status"] == 0) & (lib["err_T"] < 0.02)
        self.library = lib

    def _seed_from_library(self, st: SimState, idx, err,
                           verbose: bool = False):
        """t=0 library splice: each needy problem takes its OWN library
        plan (solved from exactly this initial state). Rows whose stored
        x0 does not match the live state (guess pickle changed since the
        library was built) or whose plan missed the target fall through
        to the online seed machinery. Returns (state, accepted mask)."""
        lib = self.library
        B = err.shape[0]
        accepted = np.zeros(B, bool)
        idx = np.asarray(idx)
        idx = idx[idx < lib["x0"].shape[0]]
        if idx.size == 0:
            return st, accepted
        fresh = np.max(np.abs(np.asarray(st.x)[idx]
                              - lib["x0"][idx]), axis=1) < 1e-4
        usable = fresh & lib["good"][idx]
        stale = idx[~fresh]
        if stale.size and verbose:
            print(f"  library: {stale.size} rows have a stale x0 "
                  f"(rebuild the planlib for this guess pickle)",
                  flush=True)
        sel = idx[usable]
        if sel.size == 0:
            return st, accepted
        dt = np.asarray(st.x).dtype
        st, acc = self._splice_plans(
            st, sel, lib["xs"][sel].astype(dt), lib["us"][sel].astype(dt),
            np.ones(sel.size, bool), lib["err_T"][sel], lib["viol"][sel],
            err[sel], verbose, tag="lib_seed")
        return st, acc

    def _library_attach(self, st: SimState, idx, err,
                        verbose: bool = False):
        """Stall-path re-seed from the library: find, per stalled
        problem, the library plan node nearest its CURRENT state (same
        max-abs metric and 0.05 gate as the f64-harvest staleness
        check); splice that plan's suffix as a fresh guess + guidance.
        Zero solves — the library already paid for the route. Bounded
        per problem by `lib_attach_max` so a problem that keeps falling
        off library plans escalates to the f64 fallback instead of
        looping. Returns (state, accepted mask)."""
        lib = self.library
        B = err.shape[0]
        accepted = np.zeros(B, bool)
        if lib is None:
            return st, accepted
        good = np.flatnonzero(lib["good"])
        if good.size == 0:
            return st, accepted
        idx = np.asarray(idx)
        idx = idx[self.lib_attach_tries[idx] < self.lib_attach_max]
        if idx.size == 0:
            return st, accepted
        N = self.ctrl.N
        L = lib["xs"].shape[1]          # padded plan nodes
        # real (un-padded) nodes only, and leave >= N+1 nodes of runway
        # for the guess splice: node k of plan j is attachable when
        # k <= length_j - N
        node_ok = np.arange(L)[None, :] <= (lib["length"][good]
                                            - N)[:, None]   # (G, L)
        xs_g = lib["xs"][good]          # (G, L, nx)
        x_now = np.asarray(st.x)[idx]   # (M, nx)
        # (M, G, L) max-abs distance; mask padded/late nodes
        d = np.max(np.abs(x_now[:, None, None, :] - xs_g[None]), axis=3)
        d = np.where(node_ok[None], d, np.inf)
        flat = d.reshape(idx.size, -1)
        best = np.argmin(flat, axis=1)
        dmin = flat[np.arange(idx.size), best]
        jj, kk = np.unravel_index(best, (good.size, L))
        ok = dmin < self.lib_attach_tol
        self._ev("lib_attach", idx, d=np.asarray(dmin),
                 plan=good[jj].astype(int).tolist(),
                 node=kk.astype(int).tolist(),
                 accepted=ok.astype(int).tolist())
        self.lib_attach_tries[idx] += 1
        if not ok.any():
            return st, accepted
        sel = idx[ok]
        dt = np.asarray(st.x).dtype
        P = self.plan_len
        xs_sfx = np.empty((sel.size, P, xs_g.shape[2]), dt)
        us_sfx = np.zeros((sel.size, P - 1, lib["us"].shape[2]), dt)
        for m, (j, k) in enumerate(zip(jj[ok], kk[ok])):
            tail = xs_g[j, k:]
            xs_sfx[m, :tail.shape[0]] = tail
            xs_sfx[m, tail.shape[0]:] = tail[-1]
            utail = lib["us"][good[j], k:]
            us_sfx[m, :utail.shape[0]] = utail
        st, acc = self._splice_plans(
            st, sel, xs_sfx, us_sfx, np.ones(sel.size, bool),
            lib["err_T"][good[jj[ok]]], lib["viol"][good[jj[ok]]],
            err[sel], verbose, tag="lib_attach")
        return st, acc

    # ------------------------------------------------------------- hook

    def maybe_replan(self, st: SimState, verbose: bool = False,
                     frac_done: float = 0.0,
                     hooks_left: int = 99) -> SimState:
        """Between-segment hook: advance guidance on active plans, detect
        stalls, replan, splice guesses + set guidance.

        `frac_done` (episode progress in [0, 1]) switches the finisher to
        ENDGAME mode past 0.6: any running problem within finish_tol gets
        a finisher attempt regardless of the slow-progress gate — the
        round-3 near-miss census showed those problems converge given
        machinery time (15/16 in +200 steps), so late arrivals must not
        wait for a stall verdict.

        `hooks_left` (this hook included) gates the f64 machinery: the
        LAST hook block-harvests everything in flight, and no job is
        launched without a future hook to harvest it."""
        model = self.model
        B = st.x.shape[0]
        self._ensure_plan_store(B)
        self.round += 1
        ee = np.asarray(jax.vmap(model.ee_pos)(st.x))
        err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
        self._ev("hook", err=err, frac=round(float(frac_done), 3),
                 hooks_left=int(hooks_left),
                 pmode=self.pmode.astype(int).tolist()
                 if self.pmode is not None else None)
        st = self._harvest_f64(st, err, verbose, final=hooks_left <= 1)
        self._hooks_left = int(hooks_left)
        # hold timeout: a parked problem whose job never harvests (worker
        # starved/crashed) resumes the normal machinery
        if self.hold_for_f64.any():
            self.hold_rounds[self.hold_for_f64] += 1
            expired = self.hold_for_f64 \
                & (self.hold_rounds > self.hold_max_rounds)
            if expired.any():
                self._ev("hold_timeout", np.flatnonzero(expired))
                self._to_track(np.flatnonzero(expired))
                guide_on = np.asarray(st.ctrl.guide_on).copy()
                guide_on[expired] = False
                st = dataclasses.replace(st, ctrl=dataclasses.replace(
                    st.ctrl, guide_on=jnp.asarray(guide_on)))
                if verbose:
                    print(f"  hold timeout: released "
                          f"{int(expired.sum())} parked problems",
                          flush=True)
        st, abandoned = self._update_guidance(st, ee, err)

        # ---- terminal brake splice: a replan/guidance detour can leave
        # the arm COASTING in the EE null space at the target (EE err
        # ~1e-4, |v| ~0.25 rad/s — free under the EE-only cost, and the
        # LM term anchors each tick to the previous coasting plan) until
        # a joint limit drags the EE off. Splicing a hold guess (ug = 0;
        # guess_correction re-rolls it through the dynamics) makes the
        # next RTI brake to rest ON target.
        nq = self.model.nq
        vmax = np.abs(np.asarray(st.x)[:, nq:]).max(axis=1)
        running0 = np.asarray(st.mode) == MODE_MPC
        # only brake NON-IMPROVING problems: an approacher crossing into
        # the 5 mm radius at speed is finishing, not coasting — braking
        # it mid-approach sets up a brake/re-approach oscillation that
        # parks problems 1-6 mm off target (measured, flagship round 4)
        no_prog = (self.prev_err - err < 2e-4) \
            if self.prev_err is not None else np.zeros(len(err), bool)
        # near-miss finisher first: non-improving, unguided, within
        # finish_tol of the target but not converged -> full-SQP solve
        # at the MPC horizon, spliced as a fresh guess. Supersedes the
        # brake (which parks the arm off target) and the stall replan
        # (which cannot accept sub-accept_margin improvements).
        # looser progress gate than the brake: a brake/approach
        # oscillator creeps a few 1e-4 per segment and would never trip
        # no_prog, yet it is exactly what the finisher converts (round-6
        # census: near-misses parked just over the 1 mm tol); firing on
        # a slow converger is harmless — the splice only happens for a
        # verified sub-0.5*tol solution with guidance off
        slow = (self.prev_err - err < 1e-3) \
            if self.prev_err is not None else np.zeros(len(err), bool)
        if frac_done >= 0.6:
            slow = np.ones(len(err), bool)   # endgame: always attempt
        # TRACK problems, plus FINI re-certification while unconverged
        # (bounded by finish_tries); never PLAN or HELD
        fin_eligible = np.isin(self.pmode, (PMODE_TRACK, PMODE_FINI))
        finish = running0 & (err > model.cfg.tol_conv) \
            & (err < self.finish_tol) & slow & fin_eligible \
            & (self.finish_tries < self.finish_max_tries)
        fin_ok = np.zeros(B, bool)
        if finish.any():
            st, fin_ok = self._finish_and_splice(
                st, np.flatnonzero(finish), verbose)
            # backoff bookkeeping: misses count up, a certified splice
            # resets (ADVICE r2: bound the repeated 60-iter solves)
            self.finish_tries[finish & ~fin_ok] += 1
            self.finish_tries[fin_ok] = 0
        # gate: non-improving AND unguided AND orbiting within 2 cm of
        # the target — wide enough to catch the EE-null-space orbits
        # that park problems at 2-10 mm (flagship round 5 near-miss
        # census), narrow enough not to brake a finishing approacher
        # TRACK only: FINI keeps its certified splice (invariant), HELD
        # keeps its park pose, PLAN problems are mid-detour
        coast = running0 & (err < 0.02) & (vmax > 0.05) & no_prog \
            & (self.pmode == PMODE_TRACK) & ~fin_ok
        if coast.any():
            xg_new = np.asarray(st.ctrl.xg).copy()
            ug_new = np.asarray(st.ctrl.ug).copy()
            guide_on = np.asarray(st.ctrl.guide_on).copy()
            for i in np.flatnonzero(coast):
                xg_new[i] = np.tile(np.asarray(st.x)[i],
                                    (self.ctrl.N + 1, 1))
                ug_new[i] = 0.0
                guide_on[i] = False
            self.n_brakes += int(coast.sum())
            self._ev("brake", np.flatnonzero(coast))
            st = dataclasses.replace(st, ctrl=dataclasses.replace(
                st.ctrl, xg=jnp.asarray(xg_new), ug=jnp.asarray(ug_new),
                x_viable=jnp.asarray(xg_new[:, -1]),
                guide_on=jnp.asarray(guide_on)))
        if self.prev_err is None:
            self.prev_err = err
            return st
        running = np.asarray(st.mode) == MODE_MPC
        # guided problems are judged by progress ALONG the plan (handled
        # in _update_guidance); unguided ones by progress toward the task
        stalled = running & (err > model.cfg.tol_conv) \
            & (self.prev_err - err < self.progress_tol) \
            & (self.pmode == PMODE_TRACK) & ~fin_ok
        stalled |= running & abandoned & (self.pmode == PMODE_TRACK)
        self.prev_err = err
        idx = np.flatnonzero(stalled)
        if idx.size == 0:
            return st
        # library re-attach first (zero solves): a stalled problem near
        # any good library plan's route resumes that plan from the
        # nearest node; only the residue pays for online replan solves
        accepted = np.zeros(err.shape[0], bool)
        if self.library is not None:
            st, accepted = self._library_attach(st, idx, err, verbose)
            if verbose and accepted.any():
                print(f"  library attach: {int(accepted.sum())}/{idx.size}"
                      f" re-seeded", flush=True)
            idx = idx[~accepted[idx]]
        if idx.size:
            st, acc2 = self._replan_and_splice(st, idx, err, verbose)
            accepted = accepted | acc2
        # ---- stall-round bookkeeping + f64 escape (deep wedges): after
        # `f64_after` consecutive failed on-device replans on the same
        # problem, launch an asynchronous CPU/x64 subprocess solve with
        # the retreat-via-home branch-swap guess (some wedge escapes
        # solve in f64 and fail in f32 — round-2 census); harvested at
        # the top of a later call while the TPU loop keeps running.
        self.stall_rounds[stalled & accepted] = 0
        self.stall_rounds[stalled & ~accepted] += 1
        stubborn = stalled & ~accepted & (err > 0.03) \
            & (self.stall_rounds >= self.f64_after)
        # wedge-band fast path (round-4 run-1 census): a problem sitting
        # in the KNOWN wedge band with no plan is a confirmed local
        # minimum — waiting for a second stall confirmation costs a full
        # hook of the f64 chain's already-tight runway (wedge at step
        # ~400 -> stall detect 500 -> harvest 700 left 100 steps for a
        # 320-step escape plan)
        stubborn |= stalled & ~accepted & (err > 0.03) & (err < 0.15)
        if stubborn.any():
            launched = self._launch_f64(st, np.flatnonzero(stubborn),
                                        verbose, menu=("all", "far_via"))
            # park the launched problems (HELD) until their harvest:
            # un-parked stall-path problems keep moving under the
            # on-TPU escape attempts, so the harvest's staleness check
            # (|x_now - x0_job| < 0.05) discarded the plans — run-1
            # census: late f64 jobs spliced 1-2 of 6 problems each
            if launched.size:
                st = self._hold(st, launched)
        return st

    def _launch_f64(self, st: SimState, sel, verbose: bool = False,
                    menu: tuple = ("all",)):
        """Start one asynchronous f64 escape job (if a slot is free) at
        horizon `f64_N`. `menu` picks the stacked guesses per problem:
          "all"     one DIRECT branch-swap guess per distinct IK anchor —
                    the round-4 wedge ground truth found every wedge
                    falls to at least one direct anchor guess at N=320,
                    and which anchor wins varies per wedge;
          "hold"    constant-state cold start (solves long-range starts
                    outright at N=320, e.g. round-3 p57 at 174 mm);
          "far"     the farthest-anchor direct guess only (cheapest);
          "far_via" the retreat-via-home variant of the same anchor;
          "rr"      the round-robin global anchor (cycles across jobs).
        The harvest keeps the best per problem (feasible first, then
        terminal error)."""
        if not self.use_f64 or len(self._f64_jobs) >= self.f64_max_jobs \
                or self.q_iks is None or sel.size == 0 \
                or self._hooks_left < 2:
            # < 2: no future hook exists to harvest the job (the current
            # hook's harvest already ran) — launching would waste a core
            return np.zeros(0, int)
        sel = np.asarray(sel)[:self.f64_chunk]
        n_real = sel.size
        # pad to the chunk size: fixed job shapes let the worker's
        # persistent cache skip the SQP compile on every job after the
        # first (the harvest's best-per-problem dedup absorbs duplicates)
        if sel.size < self.f64_chunk:
            sel = np.concatenate(
                [sel, np.repeat(sel[:1], self.f64_chunk - sel.size)])
        x0s = np.asarray(st.x)[sel]
        nq = self.model.nq
        Nf = self.f64_N
        far = np.argmax(np.linalg.norm(
            x0s[:, None, :nq] - self.q_iks[None, :, :nq], axis=2), axis=1)
        parts = []
        for kind in menu:
            if kind == "all":
                for k in range(len(self.q_iks)):
                    parts.append(self._ik_guess(jnp.asarray(x0s), anchor=k,
                                                N=Nf))
            elif kind == "hold":
                parts.append(self._hold_guess(jnp.asarray(x0s), N=Nf))
            elif kind == "far":
                parts.append(self._ik_guess(jnp.asarray(x0s), anchor=far,
                                            N=Nf))
            elif kind == "far_via":
                parts.append(self._ik_guess(jnp.asarray(x0s), anchor=far,
                                            via=True, N=Nf))
            elif kind == "rr":
                parts.append(self._ik_guess(
                    jnp.asarray(x0s),
                    anchor=(self.round + self.n_f64) % len(self.q_iks),
                    N=Nf))
            else:
                raise ValueError(f"unknown f64 guess kind {kind!r}")
        xg = np.concatenate([np.asarray(g[0]) for g in parts])
        ug = np.concatenate([np.asarray(g[1]) for g in parts])
        sel_j = np.tile(sel, len(parts))
        x0_j = np.tile(x0s, (len(parts), 1))
        from .escape_f64 import EscapeF64Job
        self._f64_jobs.append(EscapeF64Job(
            sel_j, x0_j, xg, ug,
            N=Nf, sqp_iters=self.f64_sqp_iters,
            due_round=self.round + self.f64_due_rounds))
        self.n_f64 += 1
        self._ev("f64_launch", sel[:n_real], menu=list(menu),
                 due_round=int(self.round + self.f64_due_rounds))
        if verbose:
            print(f"  f64 escape launched for {n_real} problems "
                  f"{sel[:n_real].tolist()} (menu {list(menu)}, "
                  f"N={Nf}, {len(parts)} guesses/problem)",
                  flush=True)
        return sel[:n_real]

    def seed_plans(self, st: SimState, verbose: bool = False) -> SimState:
        """t=0 seeding: solve a long-horizon to-target plan for EVERY
        problem from its initial state (rest, open space — far easier
        than from a wedged state) and guide accepted plans from the
        first tick. "Plan first, then track": the deep wedges form
        because greedy descent ENTERS them; a reaching plan avoids the
        entry instead of needing an escape."""
        model = self.model
        B = st.x.shape[0]
        self._ensure_plan_store(B)
        ee = np.asarray(jax.vmap(model.ee_pos)(st.x))
        err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
        self.prev_err = err
        idx = np.flatnonzero(err > max(0.02, 2 * model.cfg.tol_conv))
        if idx.size == 0:
            return st
        # library first (zero solves): every problem whose offline plan
        # reached the target splices it immediately; only the residue
        # hits the online replanner
        if self.library is not None:
            st, lib_acc = self._seed_from_library(st, idx, err, verbose)
            if verbose and lib_acc.any():
                print(f"  library seed: {int(lib_acc.sum())}/{idx.size} "
                      f"spliced", flush=True)
            idx = idx[~lib_acc[idx]]
        if idx.size == 0:
            return st
        st, _ = self._replan_and_splice(st, idx, err, verbose)
        # seed-time f64: a seed plan that itself ends in a wedge (> 2 cm
        # from the target) guides the problem INTO the wedge — the
        # long-horizon OCP's own local minimum (round-3 census). Launch
        # the f64 branch-swap job NOW for those (and for problems with
        # no accepted plan), and PARK them at their start pose under
        # static guidance until the job returns — transiting toward the
        # wedge wastes episode steps and invalidates the job's x0.
        if self.use_f64 and self.q_iks is not None:
            ee_ref = np.asarray(model.ee_ref)
            plan_err = np.linalg.norm(self.plan_ee[:, -1] - ee_ref, axis=1)
            # park only WEDGE-ENDERS (2-15 cm: the known local-minimum
            # band) and problems with no accepted plan; a plan ending
            # farther out is a long-range PARTIAL that genuinely
            # progresses — let it transit and chain the next replan
            bad = self.plan_active & (plan_err > 0.02) & (plan_err < 0.15)
            bad[idx] |= ~self.plan_active[idx]
            # ADVICE r4: never park a problem already inside the
            # in-graph handover radius — the handover ignores its
            # static hold guidance every tick, the arm drifts toward
            # the task, and the f64 harvest's staleness check then
            # discards the escape plan. Such problems are within
            # finisher reach (handover_tol <= finish_tol) regardless.
            if self.ctrl.handover_tol > 0:
                bad &= err > self.ctrl.handover_tol
            bad_idx = np.flatnonzero(bad)[:self.f64_chunk
                                          * self.f64_max_jobs]
            if bad_idx.size:
                st = self._hold(st, bad_idx)
                for a in range(0, bad_idx.size, self.f64_chunk):
                    self._launch_f64(st, bad_idx[a:a + self.f64_chunk],
                                     verbose, menu=("all", "hold"))
                if verbose:
                    print(f"  parked {bad_idx.size} wedge-bound problems "
                          f"for seed-time f64", flush=True)
        return st

    def _hold(self, st: SimState, sel) -> SimState:
        """Park `sel` at their current pose: static EE guidance + hold
        guess; their plans (if any) deactivate. HELD problems are
        skipped by every other machinery phase until their harvest."""
        assert not np.any(self.pmode[sel] == PMODE_FINI), \
            "invariant: a finisher-certified problem is never parked"
        self._ev("park", sel)
        self.pmode[sel] = PMODE_HELD
        self.hold_rounds[sel] = 0
        ee_now = np.asarray(jax.vmap(self.model.ee_pos)(st.x))[sel]
        N = self.ctrl.N
        xg_new = np.asarray(st.ctrl.xg).copy()
        ug_new = np.asarray(st.ctrl.ug).copy()
        p_guide = np.asarray(st.ctrl.p_guide).copy()
        guide_on = np.asarray(st.ctrl.guide_on).copy()
        x_now = np.asarray(st.x)[sel]
        xg_new[sel] = np.tile(x_now[:, None], (1, N + 1, 1))
        ug_new[sel] = 0.0
        p_guide[sel] = ee_now[:, None]
        guide_on[sel] = True
        ctrl_new = dataclasses.replace(
            st.ctrl, xg=jnp.asarray(xg_new), ug=jnp.asarray(ug_new),
            p_guide=jnp.asarray(p_guide, st.ctrl.xg.dtype),
            guide_on=jnp.asarray(guide_on),
            plan_ptr=jnp.where(
                jnp.asarray(np.isin(np.arange(len(guide_on)), sel)),
                jnp.zeros_like(st.ctrl.plan_ptr), st.ctrl.plan_ptr))
        return dataclasses.replace(st, ctrl=ctrl_new)

    def _replan_and_splice(self, st: SimState, idx, err,
                           verbose: bool = False):
        """Batched replan solves for the stalled set; returns the updated
        state and the full-batch accepted mask."""
        accepted = np.zeros(err.shape[0], bool)
        for a in range(0, idx.size, self.chunk):
            sel = idx[a:a + self.chunk]
            pad = self.chunk - sel.size
            sel_p = np.concatenate([sel, np.repeat(sel[:1], pad)])
            x0s = jnp.asarray(np.asarray(st.x)[sel_p])
            xs, us, feas, err_T, viol = self._replan_chunk(x0s)
            s = sel.size
            self.n_replans += s
            st, acc = self._splice_plans(
                st, sel, np.asarray(xs)[:s], np.asarray(us)[:s],
                np.asarray(feas)[:s], np.asarray(err_T)[:s],
                np.asarray(viol)[:s], err[sel], verbose)
            accepted |= acc
        return st, accepted

    def _splice_plans(self, st: SimState, sel, xs, us, feas, err_T, viol,
                      err_sel, verbose: bool = False, tag: str = "replan"):
        """Two-tier acceptance + splice for a set of solved plans
        (sel-indexed arrays, full plan length self.replan.N). Returns
        (state, full-batch accepted mask)."""
        model = self.model
        N = self.ctrl.N
        B = np.asarray(st.x).shape[0]
        improve = err_T < err_sel - self.accept_margin
        # invariant: never overwrite a finisher-certified guess (a late
        # f64 harvest may target a problem that went FINI meanwhile)
        improve &= self.pmode[sel] != PMODE_FINI
        # tier 1: feasible plan -> guess splice + guidance
        ok_s = feas & improve
        # tier 2: near-feasible plan -> GUIDANCE ONLY (cost shaping;
        # constraints stay with the MPC). Reaching the target region
        # OR making a big dent (>= 15 cm) both qualify: a partial
        # route still moves the loop to a state the next stall
        # replan can finish from (chained replanning)
        ok_g = ~feas & improve & (viol < 0.05) \
            & ((err_T < 0.05) | (err_T < err_sel - 0.15))
        accept_s = np.zeros(B, bool)
        accept_g = np.zeros(B, bool)
        accept_s[sel] = ok_s
        accept_g[sel] = ok_g
        self._ev("splice:" + tag, sel, err_T=np.asarray(err_T),
                 feasible=np.asarray(feas).astype(int).tolist(),
                 spliced=np.asarray(ok_s).astype(int).tolist(),
                 guide_only=np.asarray(ok_g).astype(int).tolist())
        if not (accept_s.any() or accept_g.any()):
            return st, accept_s
        self.n_accepted += int(accept_s.sum() + accept_g.sum())
        ok_any = ok_s | ok_g
        any_sel = sel[ok_any]
        # guess splice (tier 1 only; set_guess semantics)
        xg_new = np.asarray(st.ctrl.xg).copy()
        ug_new = np.asarray(st.ctrl.ug).copy()
        s_sel = sel[ok_s]
        xg_new[s_sel] = np.asarray(xs[:, :N + 1])[ok_s]
        ug_new[s_sel] = np.asarray(us[:, :N])[ok_s]
        # plans' EE paths + timed guidance (both tiers): the FULL
        # plan path loads into the guidance buffer, pointer at 0;
        # plans shorter than the buffer (on-TPU replans vs f64_N) pad
        # with their end point — guidance holds the plan's terminal
        # target once consumed
        plan_x = xs[ok_any]
        if plan_x.shape[1] > self.plan_len:
            raise ValueError(
                f"plan length {plan_x.shape[1]} exceeds the guidance "
                f"buffer ({self.plan_len}); the buffer is sized at "
                f"construction from max(replan N, f64_N, library length)")
        plan_ee = np.asarray(jax.vmap(jax.vmap(model.ee_pos))(
            jnp.asarray(plan_x)))
        if plan_ee.shape[1] < self.plan_len:
            pad = self.plan_len - plan_ee.shape[1]
            plan_ee = np.concatenate(
                [plan_ee, np.repeat(plan_ee[:, -1:], pad, axis=1)], axis=1)
        self.plan_ee[any_sel] = plan_ee
        self.pmode[any_sel] = PMODE_PLAN     # (TRACK|HELD) -> PLAN
        self.plan_ptr[any_sel] = 0
        p_guide = np.asarray(st.ctrl.p_guide).copy()
        guide_on = np.asarray(st.ctrl.guide_on).copy()
        ptr = np.asarray(st.ctrl.plan_ptr).copy()
        p_guide[any_sel] = plan_ee
        guide_on[any_sel] = True
        ptr[any_sel] = 0
        ctrl_new = dataclasses.replace(
            st.ctrl, xg=jnp.asarray(xg_new), ug=jnp.asarray(ug_new),
            # x_viable refresh only for rows whose GUESS changed (tier 1);
            # other rows keep their captured viable state
            x_viable=jnp.where(jnp.asarray(accept_s)[:, None],
                               jnp.asarray(xg_new[:, -1]),
                               st.ctrl.x_viable),
            p_guide=jnp.asarray(p_guide, st.ctrl.xg.dtype),
            plan_ptr=jnp.asarray(ptr, jnp.int32),
            guide_on=jnp.asarray(guide_on),
            r=jnp.where(jnp.asarray(accept_s),
                        jnp.asarray(self.ctrl.N, st.ctrl.r.dtype),
                        st.ctrl.r),
            fails=jnp.where(jnp.asarray(accept_s),
                            jnp.zeros_like(st.ctrl.fails),
                            st.ctrl.fails))
        st = dataclasses.replace(st, ctrl=ctrl_new)
        if verbose:
            print(f"  {tag}: {int(accept_s.sum())} spliced + "
                  f"{int(accept_g.sum())} guide-only / {sel.size} "
                  f"(err {np.round(err_T, 4)})", flush=True)
        return st, accept_s | accept_g
