"""Scaling-efficiency benchmark: batched RTI solves/s vs mesh size.

Problems shard over a 1-D device mesh (`safe_mpc_tpu.parallel.mesh`);
the per-cell workload is fixed, so ideal scaling is linear. On a single
-chip host this runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) to validate the sharded
path; on a pod slice the same code measures real ICI scaling
(multi-host: initialize `jax.distributed` first).

Prints one JSON line per mesh size plus a summary efficiency line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    n_virtual = int(os.environ.get("SCALING_DEVICES", "8"))
    force_cpu = os.environ.get("SCALING_CPU", "1") == "1"
    if force_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={n_virtual}").strip()
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.parallel.mesh import make_mesh, shard_batch, sharded_rti_solver

    n_dev = len(jax.devices())
    per_dev = int(os.environ.get("SCALING_BATCH_PER_DEV", "32"))
    reps = int(os.environ.get("SCALING_REPS", "5"))

    cfg = load_config().with_(N=25, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("receding", model, N=25, qp_iters=10)
    dtype = jnp.float32
    mid = jnp.asarray((model.x_min + model.x_max) / 2, dtype)

    results = []
    sizes = [s for s in (1, 2, 4, 8, n_dev) if s <= n_dev]
    for nd in sorted(set(sizes)):
        B = per_dev * nd
        key = jax.random.PRNGKey(0)
        dq = 0.1 * jax.random.normal(key, (B, model.nq), dtype)
        x0s = jnp.concatenate([mid[None, : model.nq] + dq,
                               jnp.zeros((B, model.nq), dtype)], axis=1)
        states = jax.vmap(lambda x: ctrl.initial_state(x))(x0s)
        mesh = make_mesh(nd)
        states = shard_batch(mesh, states)
        x0s = shard_batch(mesh, x0s)
        step = sharded_rti_solver(ctrl, mesh)
        jax.block_until_ready(step(states, x0s))
        t0 = time.time()
        for _ in range(reps):
            out = step(states, x0s)
        jax.block_until_ready(out)
        wall = time.time() - t0
        sps = B * reps / wall
        results.append((nd, sps))
        print(json.dumps({"mesh": nd, "batch": B,
                          "solves_per_s": round(sps, 1)}))

    base = results[0][1]
    eff = {f"x{nd}": round(sps / (base * nd), 3) for nd, sps in results}
    print(json.dumps({"metric": "scaling_efficiency", "per_device_base": round(base, 1),
                      "efficiency": eff}))


if __name__ == "__main__":
    main()
