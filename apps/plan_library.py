"""Offline f64 plan library (VERDICT r4 task 1).

Round-4 evidence: f64 escape plans spliced at t=0 won 24/24; the same
plans launched mid-episode won 0/8 — the online chain is episode-clock
starved, not capability-limited. So the long-horizon f64 all-anchor
solve moves OFFLINE, where the reference keeps its initializer stage
anyway (guess_acados.py:98-165): for EVERY problem in the guess pickle,
solve the bare-spec f64 NLP from its initial state over the full guess
menu (constant hold + one PD path per distinct IK arm branch,
sim/replan.py::pd_path_guess) at N=320, keep the best plan per problem,
and escalate problems whose best plan still misses the target to a
richer menu (retreat-via-home / high-retreat variants of 6 anchors) at
N=480 — the far-failure recipe of scripts_dev/far_ground_truth.py.

The replanner (sim/replan.py) seeds every problem from this library at
t=0 and re-attaches stalled problems to the nearest library plan node;
mid-episode f64 subprocesses become a fallback.

Writes ``{guess prefix}_planlib.npz``:
  xs (B, N_PAD+1, nx) f64   plans, tail-padded with the last real state
  us (B, N_PAD, nu)         tail-padded with zeros
  length (B,)               the winning plan's real horizon
  status/err_T/viol (B,)    solver verdicts of the winning plan
  tag (B,) str              which menu guess won
  x0 (B, nx)                the state each plan starts from (= guess x0)

Usage (CPU-only; spawns up to --jobs f64 worker subprocesses):
  python apps/plan_library.py -c receding --horizon 45 [--batch 100]
"""

from __future__ import annotations

import os
import sys
import time

from _common import setup_runtime
from safe_mpc_tpu.config import config_from_args, parse_args

N_PASS1 = 320
N_PASS2 = 480
N_PAD = 480            # storage horizon (all plans padded to this)
ITERS_PASS1 = 60       # matches the online seed jobs (warm XLA cache)
ITERS_PASS2 = 80
QP_ITERS = 25
CHUNK = 6              # problems per worker job (matches sim/replan.py
#                        f64_chunk: fixed job shapes -> worker cache hits)
ESCALATE_ERR = 0.02    # a best plan ending farther than this escalates


def _pool_run(tasks, max_jobs, verbose=True):
    """Run EscapeF64Job tasks through a bounded subprocess pool.
    tasks: list of (tag, sel, x0s, xg, ug, N, sqp_iters). Returns
    list of (tag, poll-output) in completion order."""
    import numpy as np

    from safe_mpc_tpu.sim.escape_f64 import EscapeF64Job

    results, jobs = [], []
    pending = list(tasks)
    t0 = time.time()
    try:
        while pending or jobs:
            while pending and len(jobs) < max_jobs:
                tag, sel, x0s, xg, ug, N, iters = pending.pop(0)
                job = EscapeF64Job(np.asarray(sel), x0s, xg, ug, N=N,
                                   sqp_iters=iters, qp_iters=QP_ITERS)
                job.tag = tag
                jobs.append(job)
                if verbose:
                    print(f"[{time.time()-t0:6.0f}s] launched {tag} "
                          f"({len(pending)} queued)", flush=True)
            time.sleep(10)
            for job in list(jobs):
                out = job.poll()
                if out is None:
                    continue
                jobs.remove(job)
                results.append((job.tag, out))
                if verbose:
                    _, _, _, _, status, err_T, _ = out
                    feas = int((np.asarray(status) == 0).sum())
                    print(f"[{time.time()-t0:6.0f}s] {job.tag}: "
                          f"{feas}/{len(status)} feasible, best err_T "
                          f"{np.min(np.asarray(err_T))*1000:.2f} mm",
                          flush=True)
    except BaseException:
        for job in jobs:
            job.cancel()
        raise
    return results


def main(argv=None):
    args = parse_args(argv)
    setup_runtime(force_cpu=True)   # parent is glue; workers are f64 CPU

    import jax
    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import (guess_path, load_guess,
                                            planlib_path)
    from safe_mpc_tpu.sim.replan import pd_path_guess
    from safe_mpc_tpu.tasks.ik import solve_ik_diverse

    cfg = config_from_args(args, rti=True)
    model = ManipulatorModel(cfg)
    cont_name = args["controller"]
    horizon = args["horizon"]
    max_jobs = int(args.get("jobs") or os.environ.get("PLANLIB_JOBS", 4))

    gpath = guess_path(cfg, cont_name, horizon)
    print(f"loading guess {gpath}")
    xg, _ = load_guess(gpath)
    test_num = min(args.get("batch") or cfg.test_num, xg.shape[0])
    x0s = np.asarray(xg[:test_num, 0, :], np.float64)
    B, nx = x0s.shape
    nu = model.nu

    # pass-1 anchors REPLICATE the online replanner's (same
    # n_anchors/n_starts/key -> identical branches, sim/replan.py:189-192)
    anchors1 = np.asarray(solve_ik_diverse(
        model, jnp.asarray(model.ee_ref), n_anchors=4, n_starts=64))
    print(f"pass 1: {len(anchors1)} IK anchors, N={N_PASS1}")

    def menu_pass1(x0c):
        """(tagged guess list) for one problem chunk, online seed menu
        ('all' + 'hold', sim/replan.py seed_plans)."""
        out = [("hold", np.tile(x0c[:, None], (1, N_PASS1 + 1, 1)),
                np.zeros((len(x0c), N_PASS1, nu)))]
        for k in range(len(anchors1)):
            pick = np.tile(anchors1[k][None], (len(x0c), 1))
            xs, us = pd_path_guess(model, x0c, pick, N_PASS1)
            out.append((f"a{k}", np.asarray(xs, np.float64),
                        np.asarray(us, np.float64)))
        return out

    # ---- pass 1: chunked jobs, full menu stacked per job -------------
    tasks = []
    for a in range(0, B, CHUNK):
        sel = np.arange(a, min(a + CHUNK, B))
        if sel.size < CHUNK:              # pad to the compiled job shape
            sel = np.concatenate([sel, np.full(CHUNK - sel.size, sel[0])])
        x0c = x0s[sel]
        menu = menu_pass1(x0c)
        xg_j = np.concatenate([m[1] for m in menu])
        ug_j = np.concatenate([m[2] for m in menu])
        sel_j = np.tile(sel, len(menu))
        x0_j = np.tile(x0c, (len(menu), 1))
        tags = [m[0] for m in menu]
        tasks.append((f"p{a}-{sel[-1]}", sel_j, x0_j, xg_j, ug_j,
                      N_PASS1, ITERS_PASS1))
        tasks[-1] = tasks[-1] + (np.repeat(tags, CHUNK),)

    t0 = time.time()
    # strip the per-row tag array before pooling; keep it for attribution
    rowtags = {t[0]: t[7] for t in tasks}
    results = _pool_run([t[:7] for t in tasks], max_jobs)

    # ---- best per problem -------------------------------------------
    best = {}    # problem -> dict(row fields)

    def fold(tag, out, N, row_tags=None):
        sel, x0, xs, us, status, err_T, viol = out
        sel = np.asarray(sel)
        for i in range(sel.size):
            p = int(sel[i])
            cand = dict(xs=np.asarray(xs[i]), us=np.asarray(us[i]),
                        status=int(status[i]), err_T=float(err_T[i]),
                        viol=float(viol[i]), N=N,
                        tag=(row_tags[i] if row_tags is not None else tag))
            b = best.get(p)
            key = (cand["status"] != 0, cand["err_T"])
            if b is None or key < (b["status"] != 0, b["err_T"]):
                best[p] = cand
    for tag, out in results:
        fold(tag, out, N_PASS1, rowtags.get(tag))

    done = sorted(best)
    errs = np.array([best[p]["err_T"] for p in done])
    feas = np.array([best[p]["status"] == 0 for p in done])
    print(f"pass 1 done in {time.time()-t0:.0f}s: "
          f"{int(feas.sum())}/{len(done)} feasible, "
          f"{int((errs < ESCALATE_ERR).sum())} within {ESCALATE_ERR*1000:.0f} mm")

    # ---- save (pass-1 library is usable while pass 2 runs) ----------
    def save():
        xs_all = np.zeros((B, N_PAD + 1, nx))
        us_all = np.zeros((B, N_PAD, nu))
        length = np.zeros(B, int)
        status = np.full(B, 4)
        err_T = np.full(B, np.inf)
        viol = np.full(B, np.inf)
        tag = np.full(B, "", dtype="U16")
        for p, bst in best.items():
            L = bst["N"]
            xs_all[p, :L + 1] = bst["xs"]
            xs_all[p, L + 1:] = bst["xs"][-1]     # rest-pad (constant EE)
            us_all[p, :L] = bst["us"]
            length[p] = L
            status[p] = bst["status"]
            err_T[p] = bst["err_T"]
            viol[p] = min(bst["viol"], 1e6)
            tag[p] = bst["tag"]
        out_path = planlib_path(cfg, cont_name, horizon)
        np.savez(out_path, xs=xs_all, us=us_all, length=length,
                 status=status, err_T=np.where(np.isfinite(err_T), err_T,
                                               1e6),
                 viol=viol, tag=tag, x0=x0s,
                 sqp_iters=ITERS_PASS1, n_anchors=len(anchors1))
        print(f"saved {out_path}")
        return out_path
    save()

    # ---- pass 2: escalation for problems still missing the target ---
    bad = [p for p in range(B)
           if p not in best or best[p]["status"] != 0
           or best[p]["err_T"] > ESCALATE_ERR]
    if bad:
        print(f"pass 2: escalating {len(bad)} problems {bad} "
              f"(N={N_PASS2}, via/hi menu)")
        anchors2 = np.asarray(solve_ik_diverse(
            model, jnp.asarray(model.ee_ref), n_anchors=6, n_starts=96))
        q_home = 0.5 * (np.asarray(model.robot.q_min)
                        + np.asarray(model.robot.q_max))
        # high retreat: shoulder up, out of the cage from above
        # (scripts_dev/far_ground_truth.py menu)
        q_hi = q_home.copy()
        q_hi[1] = 0.8 * np.asarray(model.robot.q_min)[1] \
            + 0.2 * np.asarray(model.robot.q_max)[1]

        CH2 = 2          # 2 problems x 19 guesses = 38 rows per job
        tasks2 = []
        for a in range(0, len(bad), CH2):
            sel = np.asarray(bad[a:a + CH2])
            if sel.size < CH2:
                sel = np.concatenate([sel, np.full(CH2 - sel.size, sel[0])])
            x0c = x0s[sel]
            menu = [("L:hold", np.tile(x0c[:, None], (1, N_PASS2 + 1, 1)),
                     np.zeros((len(x0c), N_PASS2, nu)))]
            for k in range(len(anchors2)):
                pick = np.tile(anchors2[k][None], (len(x0c), 1))
                for sfx, via in (("", None), ("+via", q_home), ("+hi", q_hi)):
                    xs, us = pd_path_guess(model, x0c, pick, N_PASS2,
                                           via_q=via)
                    menu.append((f"L:a{k}{sfx}", np.asarray(xs, np.float64),
                                 np.asarray(us, np.float64)))
            xg_j = np.concatenate([m[1] for m in menu])
            ug_j = np.concatenate([m[2] for m in menu])
            sel_j = np.tile(sel, len(menu))
            x0_j = np.tile(x0c, (len(menu), 1))
            tags = np.repeat([m[0] for m in menu], CH2)
            rowtags[f"L{a}"] = tags
            tasks2.append((f"L{a}", sel_j, x0_j, xg_j, ug_j,
                           N_PASS2, ITERS_PASS2))
        results2 = _pool_run(tasks2, max_jobs)
        for tag, out in results2:
            fold(tag, out, N_PASS2, rowtags.get(tag))
        save()

    done = sorted(best)
    errs = np.array([best[p]["err_T"] for p in done])
    feas = np.array([best[p]["status"] == 0 for p in done])
    good = feas & (errs < ESCALATE_ERR)
    print(f"library complete in {time.time()-t0:.0f}s: "
          f"{int(feas.sum())}/{B} feasible, {int(good.sum())}/{B} "
          f"within {ESCALATE_ERR*1000:.0f} mm of the target")
    worst = np.argsort(-errs)[:8]
    for w in worst:
        p = done[int(w)]
        print(f"  worst: p{p} err_T {errs[w]*1000:8.2f} mm "
              f"status {best[p]['status']} tag {best[p]['tag']}")


if __name__ == "__main__":
    main()
