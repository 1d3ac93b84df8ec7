"""Far-failure ground truth (VERDICT r3 task 5): are the flagship's
FAR failure states (0.15-0.7 m EE error) escapable at all?

Round-4 run-1 census: 5 problems ended 320-580 mm out; their on-TPU
N=240 replans failed repeatedly (same rejected err in the log across
hooks) and their f64 N=320 jobs never produced an accepted plan. This
experiment solves long-horizon f64 bare-spec NLPs from those states
with a RICHER menu than the online machinery:

  hold          constant-state cold start
  a<k>          PD path to IK anchor k (all distinct branches)
  a<k>+via      retreat-through-home variant
  a<k>+hi       retreat through a HIGH pose (arm up, out of the cage)
  long:*        the same at N=480 (2.4 s)

Writes data_noise/far_ground_truth.json. If a state is infeasible for
every guess at N=480, the honest conclusion is that the ONLINE chain
cannot save it — the seed must avoid it (VERDICT r3 task 5: fix the
seed, not the escape).

Run when the CPU is free (spawns f64 subprocess workers):
  python scripts_dev/far_ground_truth.py
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

SQP_ITERS = 80
QP_ITERS = 25
MAX_JOBS = int(os.environ.get("FAR_JOBS", "3"))

cfg = config_from_args({"controller": "receding", "horizon": 45},
                       rti=True)
model = ManipulatorModel(cfg)
ref = np.asarray(cfg.ee_ref)

P = os.environ.get(
    "FAR_PICKLE",
    "data_noise/z1_receding_use_netTrue_45hor_10sm_"
    "noise_0.0_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl")
d = pickle.load(open(P, "rb"))
x = np.asarray(d["x"])

import jax.numpy as jnp

ee_fn = jax.jit(jax.vmap(model.ee_pos))

far, states = [], []
for i in d["unconv_idx"]:
    e = np.linalg.norm(np.asarray(ee_fn(jnp.asarray(x[i]))) - ref[None],
                       axis=1)
    if e[-1] > 0.15:
        far.append(int(i))
        # the state of deepest approach: the best launch point any
        # online hook could have seen
        states.append(x[i, int(e.argmin())])
states = np.asarray(states)
print(f"far problems: {far}")
errs0 = np.linalg.norm(np.asarray(ee_fn(jnp.asarray(states))) - ref[None],
                       axis=1)
print("start err (mm):", np.round(errs0 * 1000, 1), flush=True)

anchors = solve_ik_diverse(model, jnp.asarray(model.ee_ref),
                           n_anchors=6, n_starts=96)
anchors = np.asarray(anchors)
print(f"{len(anchors)} IK anchors")
q_home = 0.5 * (np.asarray(model.robot.q_min) + np.asarray(model.robot.q_max))
# high retreat: shoulder up, elbow folded — clears the cage from above
q_hi = q_home.copy()
q_hi[1] = 0.8 * np.asarray(model.robot.q_min)[1] \
    + 0.2 * np.asarray(model.robot.q_max)[1]

menu = []
for N_PLAN, pre in ((320, ""), (480, "long:")):
    menu.append((f"{pre}hold",
                 np.tile(states[:, None], (1, N_PLAN + 1, 1)),
                 np.zeros((len(far), N_PLAN, model.nu)), N_PLAN))
    for k in range(len(anchors)):
        pick = np.tile(anchors[k][None], (len(far), 1))
        xs, us = pd_path_guess(model, states, pick, N_PLAN)
        menu.append((f"{pre}a{k}", xs, us, N_PLAN))
        xs, us = pd_path_guess(model, states, pick, N_PLAN, via_q=q_home)
        menu.append((f"{pre}a{k}+via", xs, us, N_PLAN))
        xs, us = pd_path_guess(model, states, pick, N_PLAN, via_q=q_hi)
        menu.append((f"{pre}a{k}+hi", xs, us, N_PLAN))

jobs, results = [], {}
pending = list(menu)
t0 = time.time()
while pending or jobs:
    while pending and len(jobs) < MAX_JOBS:
        tag, xg, ug, Np = pending.pop(0)
        sel = np.arange(len(far))
        job = EscapeF64Job(sel, states, xg, ug, N=Np,
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
              f"{int(feas.sum())}/{len(far)}, err_T(mm)="
              f"{np.round(np.asarray(err_T)*1000, 2)}", flush=True)

out_path = "data_noise/far_ground_truth.json"
with open(out_path, "w") as f:
    json.dump({"problems": far,
               "start_err_mm": np.round(errs0 * 1000, 1).tolist(),
               "sqp_iters": SQP_ITERS,
               "results": results}, f, indent=1)
print(f"saved {out_path}")
