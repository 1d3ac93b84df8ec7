"""Round-4 drift-off diagnostic: does the near-target terminal velocity
cost (wv_near) stop the null-space orbit?

Run-1 census: 21/47 failures touched <1 mm mid-episode and drifted off
at ~0.25 rad/s — the EE-only reach cost is blind to null-space velocity.
Takes those problems' states at their minimum-error step from the run-1
flagship pickle and runs the PLAIN closed loop (no replanner) forward,
sweeping wv configurations.

  DIAG_CPU=1 forces CPU; DIAG_CONFIGS / DIAG_STEPS as in diag_r4_nearmiss.
"""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

if os.environ.get("DIAG_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp

from safe_mpc_tpu.utils.cache import host_cache_dir

cache = host_cache_dir(os.path.join("generated", "xla_cache_diag"))
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from safe_mpc_tpu.config import config_from_args
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.controllers.registry import get_controller
from safe_mpc_tpu.controllers.base import SafeBackupController
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim

print("backend:", jax.default_backend(), flush=True)
cfg = config_from_args({"controller": "receding", "horizon": 45},
                       rti=True).with_(dtype="float32")
model = ManipulatorModel(cfg)

P = "data_noise/z1_receding_use_netTrue_45hor_10sm_" \
    "noise_0.0_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl"
d = pickle.load(open(P, "rb"))
x = np.asarray(d["x"])
ref = np.asarray(cfg.ee_ref)

# drift-off problems from the run-1 census; start each at the step of
# its minimum EE error (the orbit pass-through, |v| ~ 0.25)
DRIFT = [2, 6, 14, 18, 23, 30, 32, 33, 35, 36, 43, 47, 48, 50, 52, 58,
         61, 66, 74, 83, 87]
import jax as _j
ee_all = np.asarray(_j.vmap(_j.vmap(model.ee_pos))(
    jnp.asarray(x[DRIFT], jnp.float32)))
err_all = np.linalg.norm(ee_all - ref[None, None], axis=2)
t_min = err_all.argmin(axis=1)
x0s = jnp.asarray(np.stack([x[p, t] for p, t in zip(DRIFT, t_min)]),
                  jnp.float32)
v0 = np.linalg.norm(np.asarray(x0s)[:, model.nq:], axis=1)
print("start err (mm):", np.round(err_all.min(axis=1) * 1000, 2))
print("start |v|:", np.round(v0, 3), flush=True)

N_STEPS = int(os.environ.get("DIAG_STEPS", "100"))


def run(tag, ctrl):
    sim = ClosedLoopSim(ctrl, backup=SafeBackupController(model,
                                                          N=cfg.back_hor))
    res = sim.run(x0s, n_steps=N_STEPS, segment=None)
    ee = np.asarray(jax.vmap(jax.vmap(model.ee_pos))(jnp.asarray(res.xs)))
    err = np.linalg.norm(ee - ref[None, None], axis=2) * 1000  # mm
    v_end = np.linalg.norm(np.asarray(res.xs)[:, -1, model.nq:], axis=1)
    fin = err[:, -1]
    print(f"{tag:12s} final_mm={np.round(fin, 3)}\n"
          f"{'':12s} |v|_end={np.round(v_end, 3)} "
          f"conv={(fin < 1.0).sum()}/{len(DRIFT)}", flush=True)


CONFIGS = {
    "base": dict(rti_iters=3),
    "wv": dict(rti_iters=3, wv_near_tol=2e-2),
    "wv_big": dict(rti_iters=3, wv_near_tol=2e-2, wv_weight=50.0),
    "wv_lm": dict(rti_iters=3, wv_near_tol=2e-2, lm_drop_tol=5e-3),
    "wv_small": dict(rti_iters=3, wv_near_tol=2e-2, wv_weight=0.5),
}
names = os.environ.get("DIAG_CONFIGS", "base,wv").split(",")
for name in names:
    run(name, get_controller("receding", model, N=45, **CONFIGS[name]))
