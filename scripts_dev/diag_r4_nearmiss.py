"""Round-4 near-miss diagnostic: why does the closed loop park at
1.2-4 mm EE error instead of converging under tol_conv = 1 mm?

Takes the near-miss problems' states at t=700 from the round-3 flagship
pickle (scratch_flagship6) and runs the PLAIN closed loop (no replanner)
forward 300 steps in f32, sweeping the candidate levers.

  DIAG_CPU=1 forces CPU; default runs on the live backend (TPU).
  DIAG_CONFIGS=base,lm_drop,... picks configs.
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

P = "data_noise/scratch_flagship6/z1_receding_use_netTrue_45hor_10sm_" \
    "noise_0.0_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl"
d = pickle.load(open(P, "rb"))
x = np.asarray(d["x"])
NEAR = [1, 5, 18, 20, 34, 40, 45, 63]
T0 = 700
x0s = jnp.asarray(x[NEAR, T0], jnp.float32)
ref = np.asarray(cfg.ee_ref)
e0 = np.linalg.norm(np.asarray(jax.vmap(model.ee_pos)(x0s)) - ref[None],
                    axis=1)
print("start err (mm):", np.round(e0 * 1000, 2), flush=True)

N_STEPS = int(os.environ.get("DIAG_STEPS", "300"))


def run(tag, ctrl):
    sim = ClosedLoopSim(ctrl, backup=SafeBackupController(model,
                                                          N=cfg.back_hor))
    res = sim.run(x0s, n_steps=N_STEPS, segment=None)
    ee = np.asarray(jax.vmap(jax.vmap(model.ee_pos))(jnp.asarray(res.xs)))
    err = np.linalg.norm(ee - ref[None, None], axis=2) * 1000  # mm
    fin = err[:, -1]
    mn = err.min(axis=1)
    print(f"{tag:10s} final_mm={np.round(fin, 3)} min_mm={np.round(mn, 3)} "
          f"conv={(fin < 1.0).sum()}/{len(NEAR)}", flush=True)
    np.save(f"/tmp/diag_nearmiss_{tag}.npy", err)


CONFIGS = {
    "base": dict(rti_iters=3),
    "lm_drop": dict(rti_iters=3, lm_drop_tol=5e-3),
    "lm_drop25": dict(rti_iters=3, lm_drop_tol=2.5e-2),
    "rti6": dict(rti_iters=6),
    "qp40": dict(rti_iters=3, qp_iters=40),
    "zv": dict(rti_iters=3, zv_near_tol=2e-2),
    "zv_lm": dict(rti_iters=3, zv_near_tol=2e-2, lm_drop_tol=5e-3),
}
names = os.environ.get("DIAG_CONFIGS", "base,lm_drop").split(",")
for name in names:
    run(name, get_controller("receding", model, N=45, **CONFIGS[name]))
