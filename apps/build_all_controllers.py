"""Pre-compile all controllers (reference build_all_controllers.py).

The reference code-gens and gcc-compiles acados C solvers once so sweeps
can reuse them (controller.py:243-248). The XLA analogue: trace + compile
each controller's batched step into the persistent compilation cache
(apps/_common.py configures `jax_compilation_cache_dir` under
``generated/``), so sweep runs start from cache hits."""

from __future__ import annotations

import argparse
import time

from _common import setup_runtime


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--system", type=str, default="z1")
    parser.add_argument("--horizon", type=int, default=45)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    backend, dtype = setup_runtime(force_cpu=args.cpu)
    print(f"backend={backend} dtype={dtype}")

    import jax
    import jax.numpy as jnp

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.base import SafeBackupController
    from safe_mpc_tpu.controllers.registry import CONTROLLERS, get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel

    cfg = load_config().with_(urdf_name=args.system)
    if backend != "cpu":
        cfg = cfg.with_(dtype="float32")
    model = ManipulatorModel(cfg)
    jdt = jnp.float64 if dtype == "float64" else jnp.float32
    mid = jnp.asarray((model.x_min + model.x_max) / 2, jdt)
    x0s = jnp.tile(mid.at[model.nq:].set(0.0), (args.batch, 1))

    names = [n for n in CONTROLLERS if n != "backup"]
    for name in names:
        t0 = time.time()
        ctrl = get_controller(name, model, N=args.horizon)
        states = jax.vmap(lambda x: ctrl.initial_state(x))(x0s)
        step = jax.jit(jax.vmap(ctrl.step))
        jax.block_until_ready(step(states, x0s).u)
        print(f"compiled {name:<22} in {time.time() - t0:.1f}s")
    t0 = time.time()
    backup = SafeBackupController(model, N=cfg.back_hor)
    solve = jax.jit(jax.vmap(lambda x: backup.solve_backup(x)))
    jax.block_until_ready(solve(x0s).xs)
    print(f"compiled {'backup':<22} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
