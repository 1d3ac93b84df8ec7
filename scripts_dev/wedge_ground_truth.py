"""Wedge ground truth (VERDICT r3 task 4): do feasible sub-mm paths
exist from the flagship's 53 mm / 108.7 mm wedge states?

For each wedged problem of the round-3 best run (scratch_flagship6),
takes the state of deepest approach (min EE error along its episode)
and solves ONE long-horizon (N=320) f64 bare-spec NLP per (problem,
guess) via the batched CPU SQP worker, multistarted from:

  hold        constant-state cold start
  a<k>        dynamics-consistent PD path to IK anchor k (all distinct
              arm branches, tasks/ik.py::solve_ik_diverse)
  a<k>+via    the retreat-through-home variant of the same anchor

Writes data_noise/wedge_ground_truth.json with the per-guess results
and a per-problem verdict (best feasible terminal error). Reference
acceptance semantics: guess_acados.py:118-131 (status 0 + feasible).

Run (host process; spawns f64 CPU subprocesses, ~2-3 h):
  python scripts_dev/wedge_ground_truth.py
"""
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from safe_mpc_tpu.config import config_from_args
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.tasks.ik import solve_ik_diverse
from safe_mpc_tpu.sim.replan import pd_path_guess
from safe_mpc_tpu.sim.escape_f64 import EscapeF64Job

N_PLAN = 320
SQP_ITERS = 80
QP_ITERS = 25
MAX_JOBS = 2          # 4-core host; each worker is ~single-core

cfg = config_from_args({"controller": "receding", "horizon": 45},
                       rti=True)
model = ManipulatorModel(cfg)
ref = np.asarray(cfg.ee_ref)

P = "data_noise/scratch_flagship6/z1_receding_use_netTrue_45hor_10sm_" \
    "noise_0.0_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl"
d = pickle.load(open(P, "rb"))
x = np.asarray(d["x"])

import jax.numpy as jnp

ee_fn = jax.jit(jax.vmap(model.ee_pos))

# wedge problems: unconverged with min-err in the 3-20 cm band
wedge, states = [], []
for i in d["unconv_idx"]:
    e = np.linalg.norm(np.asarray(ee_fn(jnp.asarray(x[i]))) - ref[None],
                       axis=1)
    t_min = int(e.argmin())
    if 0.03 < e[t_min] < 0.20:
        wedge.append(int(i))
        states.append(x[i, t_min])
states = np.asarray(states)
print(f"wedge problems: {wedge}")
errs0 = np.linalg.norm(np.asarray(ee_fn(jnp.asarray(states))) - ref[None],
                       axis=1)
print("start err (mm):", np.round(errs0 * 1000, 1))

anchors = solve_ik_diverse(model, jnp.asarray(model.ee_ref),
                           n_anchors=6, n_starts=96)
anchors = np.asarray(anchors)
print(f"{len(anchors)} IK anchors")
q_home = 0.5 * (np.asarray(model.robot.q_min) + np.asarray(model.robot.q_max))

# build the guess menu: (tag, xg, ug) per problem batch
menu = [("hold",
         np.tile(states[:, None], (1, N_PLAN + 1, 1)),
         np.zeros((len(wedge), N_PLAN, model.nu)))]
for k in range(len(anchors)):
    pick = np.tile(anchors[k][None], (len(wedge), 1))
    xs, us = pd_path_guess(model, states, pick, N_PLAN)
    menu.append((f"a{k}", xs, us))
    xs, us = pd_path_guess(model, states, pick, N_PLAN, via_q=q_home)
    menu.append((f"a{k}+via", xs, us))

jobs, results = [], {}
pending = list(menu)
t0 = time.time()
while pending or jobs:
    while pending and len(jobs) < MAX_JOBS:
        tag, xg, ug = pending.pop(0)
        sel = np.arange(len(wedge))
        job = EscapeF64Job(sel, states, xg, ug, N=N_PLAN,
                           sqp_iters=SQP_ITERS, qp_iters=QP_ITERS)
        job.tag = tag
        jobs.append(job)
        print(f"[{time.time()-t0:7.0f}s] launched {tag}", flush=True)
    time.sleep(20)
    for job in list(jobs):
        out = job.poll()
        if out is None:
            continue
        jobs.remove(job)
        sel, x0, xs, us, status, err_T, viol = out
        results[job.tag] = {
            "status": np.asarray(status).tolist(),
            "err_T_mm": np.round(np.asarray(err_T) * 1000, 3).tolist(),
            "viol": np.round(np.asarray(viol), 6).tolist(),
        }
        feas = np.asarray(status) == 0
        print(f"[{time.time()-t0:7.0f}s] {job.tag}: feasible "
              f"{int(feas.sum())}/{len(wedge)}, err_T(mm)="
              f"{np.round(np.asarray(err_T)*1000, 2)}", flush=True)

# per-problem verdict: best feasible err_T across the menu
verdicts = []
for j, p in enumerate(wedge):
    best_tag, best_err = None, np.inf
    for tag, r in results.items():
        if r["status"][j] == 0 and r["err_T_mm"][j] < best_err:
            best_tag, best_err = tag, r["err_T_mm"][j]
    verdicts.append({"problem": p,
                     "wedge_mm": round(float(errs0[j] * 1000), 1),
                     "best_guess": best_tag,
                     "best_err_T_mm": (round(best_err, 3)
                                       if np.isfinite(best_err) else None),
                     "escapable": bool(best_err < 1.0)})
    print(verdicts[-1])

out_path = "data_noise/wedge_ground_truth.json"
with open(out_path, "w") as f:
    json.dump({"N": N_PLAN, "sqp_iters": SQP_ITERS,
               "problems": wedge,
               "start_err_mm": np.round(errs0 * 1000, 1).tolist(),
               "results": results, "verdicts": verdicts}, f, indent=1)
print(f"wrote {out_path}")
