"""Generate the committed golden parity data (tests/golden/).

VERDICT r2 #5: the strongest feasible stand-in for recorded reference
acados outputs — f64 CPU guess + closed-loop trajectories captured as
golden files; tests/test_golden.py pins future refactors to these at
<1e-6 on controls from identical state (the reference protocol:
/root/reference/scripts/mpc.py:300-315).

Usage: python scripts_dev/make_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from safe_mpc_tpu.config import load_config
from safe_mpc_tpu.controllers.registry import get_controller, \
    get_guess_controller
from safe_mpc_tpu.models.manipulator import ManipulatorModel
from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
from safe_mpc_tpu.tasks.sampling import sample_initial_states

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "golden")
N, B, STEPS = 10, 3, 40


def capture(cont_name: str, use_net: bool):
    cfg = load_config().with_(N=N, use_net=use_net)
    model = ManipulatorModel(cfg)
    gc = get_guess_controller(cont_name, model, N=N, rti_iters=60)
    x0s = sample_initial_states(model, B, margin=0.05)

    def gsolve(x0):
        st = gc.initial_state(x0)
        res = gc.solve(st, x0, gc.schedule(st))
        return res.xs, res.us, res.status

    xg, ug, status = jax.jit(jax.vmap(gsolve))(x0s)
    assert np.all(np.asarray(status) == 0), np.asarray(status)

    ctrl = get_controller(cont_name, model, N=N)
    sim = ClosedLoopSim(ctrl, backup=None)
    res = sim.run(x0s, xg=xg, ug=ug, n_steps=STEPS, segment=None)
    return {
        f"{cont_name}_x0": np.asarray(x0s),
        f"{cont_name}_xg": np.asarray(xg),
        f"{cont_name}_ug": np.asarray(ug),
        f"{cont_name}_xs": np.asarray(res.xs),
        f"{cont_name}_us": np.asarray(res.us),
        f"{cont_name}_rs": np.asarray(res.rs),
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    data = {}
    data.update(capture("naive", use_net=False))
    data.update(capture("receding", use_net=True))
    path = os.path.join(OUT, "golden_z1.npz")
    np.savez_compressed(path, **data)
    print(f"wrote {path} ({os.path.getsize(path)//1024} KiB)")


if __name__ == "__main__":
    main()
