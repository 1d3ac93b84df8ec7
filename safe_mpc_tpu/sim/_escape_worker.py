"""f64 escape-solve worker (subprocess entry point).

The flagship closed loop runs f32 on TPU; the deep 5-11 cm cage wedges
include seeds that solve in f64 and fail in f32 (measured,
scripts_dev/diag_escape2.py and the round-2 dev notes). x64 is a global
JAX flag, so the only clean way to get f64 solves next to a live f32
TPU process is a subprocess: this worker forces the CPU platform + x64,
solves the bare-spec (collision/torque/bounds, no safe rows) full SQP
for a chunk of problems, and writes the results back as an npz.

Protocol (all via one npz file, rewritten in place):
  in : xg (B, N+1, nx) f64, ug (B, N, nu), x0 (B, nx),
       N (int), sqp_iters, qp_iters, lm (floats)
  out: xs, us, status (B,), err_T (B,), ok flag

Invoked by sim/escape_f64.py; never import this module into a process
that already initialized JAX.
"""

import sys


def main(path: str) -> None:
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # persistent cache (host-fingerprinted): with fixed job shapes the
    # first job pays the SQP compile, later jobs skip straight to solving
    from ..utils.cache import host_cache_dir

    cache = host_cache_dir(os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "generated", "xla_cache_escape"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from ..config import load_config
    from ..controllers.base import MPCController
    from ..models.manipulator import ManipulatorModel
    from ..ops.sqp import sqp_solve_batched

    data = dict(np.load(path, allow_pickle=False))
    N = int(data["N"])
    cfg = load_config().with_(N=N, use_net=False, dtype="float64")
    model = ManipulatorModel(cfg)
    # bare escape spec, f64: mirrors StallReplanner._escape_ctrl
    ctrl = MPCController(model, N=N, lm=float(data["lm"]))

    xg = jnp.asarray(data["xg"], jnp.float64)
    ug = jnp.asarray(data["ug"], jnp.float64)
    x0 = jnp.asarray(data["x0"], jnp.float64)
    sched = jax.vmap(lambda x: ctrl.schedule(ctrl.initial_state(x)))(x0)
    res = sqp_solve_batched(ctrl.spec, xg, ug, x0, sched,
                            max_iters=int(data["sqp_iters"]),
                            qp_iters=int(data["qp_iters"]))
    ee_T = jax.vmap(model.ee_pos)(res.xs[:, -1])
    err = jnp.linalg.norm(ee_T - jnp.asarray(model.ee_ref)[None], axis=1)
    np.savez(path, xs=np.asarray(res.xs), us=np.asarray(res.us),
             status=np.asarray(res.status), err_T=np.asarray(err),
             viol=np.asarray(res.qp_viol), ok=1)


if __name__ == "__main__":
    main(sys.argv[1])
