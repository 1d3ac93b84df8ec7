"""Headline benchmark: batched Z1 RTI-MPC solves/s on the local accelerator.

Prints ONE JSON line:
  {"metric": "rti_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": R}

Baseline (BASELINE.md): the reference's implied serial throughput is one
acados RTI solve per 5 ms real-time budget = 200 solves/s per CPU core.
`vs_baseline` is the speedup over that single-core figure.

Config: Z1 5-DOF, horizon N=25, receding-constraint controller with the
analytic safe set (full constraint stack: joint box + torque + 6 collision
pairs + safe rows), one RTI iteration per solve — the reference's main
workload shape (BASELINE.json configs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    if backend == "cpu":
        jax.config.update("jax_enable_x64", False)  # match TPU numerics path

    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel

    N = 25
    # default batch: validated headroom on a single v5e chip (HBM-bound at
    # ~2048 with the full linearization live set)
    batch = int(os.environ.get("BENCH_BATCH", "512" if backend != "cpu"
                               else "128"))
    reps = int(os.environ.get("BENCH_REPS", "20"))

    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("receding", model, N=N, qp_iters=15)

    dtype = jnp.float32
    mid = jnp.asarray((model.x_min + model.x_max) / 2, dtype)
    # collision-free Halton-sampled rest states (same protocol as the
    # guess stage) so solver failures reflect the solver, not the sampling
    from safe_mpc_tpu.tasks.sampling import sample_initial_states
    x0s = sample_initial_states(model, batch, margin=0.05).astype(dtype)
    states = jax.vmap(lambda x: ctrl.initial_state(x))(x0s)

    chunk = int(os.environ.get("BENCH_CHUNK", "0"))
    mode = os.environ.get("BENCH_MODE", "batched")  # 'batched' | 'vmapped'

    if mode == "batched":
        # batch-major hot path: vmapped linearization + lane-major QP
        from safe_mpc_tpu.ops.sqp import rti_step_batched

        sched = ctrl.schedule(ctrl.initial_state(mid))

        def step_fn(states, xs):
            res = rti_step_batched(ctrl.spec, states.xg, states.ug, xs,
                                   sched, qp_iters=15)
            import dataclasses
            new_states = dataclasses.replace(states, xg=res.xs, ug=res.us)
            return new_states, res.us[:, 0], res.status

        step = jax.jit(step_fn)
    else:
        def one(state, x):
            res = ctrl.step(state, x)
            return res.state, res.u, res.status

        if chunk and chunk < batch:
            from safe_mpc_tpu.utils.batching import chunked_vmap
            step = jax.jit(chunked_vmap(one, chunk))
        else:
            step = jax.jit(jax.vmap(one))

    t0 = time.time()
    states2, u, status = step(states, x0s)
    jax.block_until_ready(u)
    compile_s = time.time() - t0

    # steady-state: repeated solves with evolving state (warm-started RTI)
    t0 = time.time()
    st = states2
    for _ in range(reps):
        st, u, status = step(st, x0s)
    jax.block_until_ready(u)
    wall = time.time() - t0

    solves_per_s = batch * reps / wall
    result = {
        "metric": "rti_solves_per_s",
        "value": round(float(solves_per_s), 1),
        "unit": "solves/s",
        "vs_baseline": round(float(solves_per_s) / 200.0, 2),
    }
    extra = {
        "backend": backend,
        "batch": batch,
        "horizon": N,
        "reps": reps,
        "per_solve_latency_ms": round(1e3 * wall / reps, 3),
        "compile_s": round(compile_s, 1),
        "ok_fraction": round(float(np.mean(np.asarray(status) == 0)), 3),
    }
    print(json.dumps(result))
    print(json.dumps({"detail": extra}), file=sys.stderr)


if __name__ == "__main__":
    main()
