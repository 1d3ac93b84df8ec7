"""Per-phase solver timing, mirroring the reference's acados stats report.

The reference reads 7 acados timers per solve and prints their 99%
quantiles (controller.py:123-124, mpc.py:300-303). Under XLA the phases
are fused inside one compiled program, so phase times are measured by
timing separately-jitted phase functions on representative data:

  time_lin  — constraint/cost linearization (transcribe)
  time_qp   — the IP/Riccati QP solve
  time_sim  — guess-correction rollout + plant step
  time_tot  — the fused controller step (what actually runs)

Each is amortized per problem when batched (batch wall / B).
"""

from __future__ import annotations

import time

import jax
import numpy as np

TIME_FIELDS = ["time_lin", "time_sim", "time_qp", "time_qp_solver_call",
               "time_glob", "time_reg", "time_tot"]


def _timeit(fn, *args, reps: int = 20, warmup: int = 2) -> np.ndarray:
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        out.append(time.perf_counter() - t0)
    return np.asarray(out)


def profile_controller(controller, x0s, reps: int = 20) -> dict[str, np.ndarray]:
    """Per-phase amortized timings for a batch of problems.

    Returns {field: (reps,) seconds-per-problem}; report like the
    reference: ``np.quantile(times, 0.99)`` per field (mpc.py:300-303).
    """
    B = x0s.shape[0]
    states = jax.vmap(lambda x: controller.initial_state(x))(x0s)
    sched1 = controller.schedule(jax.tree.map(lambda a: a[0], states))

    spec = controller.spec
    transcribe = jax.jit(jax.vmap(
        lambda st, x: spec.transcribe(st.xg, st.ug, x, sched1)))
    data = transcribe(states, x0s)
    from ..ops.qp import solve_qp
    qp = jax.jit(jax.vmap(lambda d: solve_qp(d, iters=controller.qp_iters)))
    rollout = jax.jit(jax.vmap(
        lambda st: controller.model.rollout(st.xg[0], st.ug)))
    full = jax.jit(jax.vmap(controller.step))

    t_lin = _timeit(transcribe, states, x0s, reps=reps) / B
    t_qp = _timeit(qp, data, reps=reps) / B
    t_sim = _timeit(rollout, states, reps=reps) / B
    t_tot = _timeit(full, states, x0s, reps=reps) / B
    zeros = np.zeros_like(t_tot)
    return {"time_lin": t_lin, "time_sim": t_sim, "time_qp": t_qp,
            "time_qp_solver_call": t_qp, "time_glob": zeros,
            "time_reg": zeros, "time_tot": t_tot}


def print_quantiles(times: dict[str, np.ndarray], q: float = 0.99) -> None:
    print(f"{int(q*100)}% quantile of the computation time (per problem):")
    for field in TIME_FIELDS:
        if field in times:
            print(f"{field:<20} -> {np.quantile(times[field], q):.3e} s")
