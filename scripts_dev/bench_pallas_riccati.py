"""Measure riccati='pallas' vs 'jnp' inside solve_qp_bl on-chip
(VERDICT round-1 item 6: prove or remove the Pallas kernel).

Times the full batched QP solve (the kernel's real context) and the
Riccati sweep alone, at B in {128, 512, 2048}.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "apps"))

from _common import setup_runtime


def main():
    backend, dtype = setup_runtime(force_cpu="--cpu" in sys.argv)
    print(f"backend={backend} dtype={dtype}")

    import jax
    import jax.numpy as jnp

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.ops.qp_batched import solve_qp_bl
    from safe_mpc_tpu.tasks.sampling import sample_initial_states

    N = 25
    cfg = load_config().with_(N=N, use_net=True)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("receding", model, N=N)
    sched = ctrl.schedule(ctrl.initial_state(
        jnp.asarray((model.x_min + model.x_max) / 2, jnp.float32)))

    for B in (128, 512, 2048):
        x0s = sample_initial_states(model, B, margin=0.05).astype(jnp.float32)
        states = jax.vmap(lambda x: ctrl.initial_state(x))(x0s)
        datab = jax.jit(lambda xg, ug, xs: ctrl.spec.transcribe_bl(
            xg, ug, xs, sched))(states.xg, states.ug, x0s)
        datab = jax.block_until_ready(datab)
        for mode in ("jnp", "pallas"):
            try:
                f = jax.jit(lambda d: solve_qp_bl(d, iters=15, riccati=mode))
                sol = jax.block_until_ready(f(datab))
                t0 = time.perf_counter()
                for _ in range(10):
                    sol = jax.block_until_ready(f(datab))
                ms = (time.perf_counter() - t0) / 10 * 1e3
                ok = float(jnp.mean((sol.status == 0).astype(jnp.float32)))
                print(f"B={B:5d} riccati={mode:6s}: {ms:8.2f} ms/solve "
                      f"ok={ok:.3f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"B={B:5d} riccati={mode:6s}: FAILED {type(e).__name__}:"
                      f" {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
