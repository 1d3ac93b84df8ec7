"""Headline benchmark: batched Z1 RTI-MPC solves/s on the local accelerator.

Default suite prints ONE JSON line:
  {"metric": "rti_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": R}

Baseline (BASELINE.md): the reference's implied serial throughput is one
acados RTI solve per 5 ms real-time budget = 200 solves/s per CPU core.
`vs_baseline` is the speedup over that single-core figure.

Headline config: Z1 5-DOF, horizon N=25, receding-constraint controller
with the NN safe set (the flagship experiment's workload: joint box +
torque + 6 collision pairs + MLP safe rows), one RTI iteration per solve.

Suites (BENCH_SUITE env):
  headline  (default) one line, the driver contract
  latency   per-tick p50/p99 latency at B in {1, 8, 64} vs the 5 ms
            real-time budget (reference config.yaml:7, mpc.py:300-303)
  matrix    the BASELINE.json config matrix: controller x alpha x horizon,
            one JSON line per cell + BENCH_MATRIX.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _setup():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    if backend == "cpu":
        jax.config.update("jax_enable_x64", False)  # match TPU numerics path
    from safe_mpc_tpu.utils.cache import host_cache_dir
    cache = host_cache_dir(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "generated", f"xla_cache_bench_{backend}"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return backend


def _build_step(controller: str, N: int, alpha: float, use_net: bool,
                qp_iters: int = 15, horizon_parallel: bool = False,
                warm_iters: int | None = None):
    """One jitted batched RTI tick (linearize + QP) for a config cell.

    `warm_iters` (default: ops.qp.WARM_ITERS; 0 disables) adds the
    IP warm start across ticks — the closed-loop configuration (HPIPM
    warm-starts the same way inside acados' RTI loop): the returned
    step has signature (states, xs, warm) -> (states, u, status, warm),
    plus a `cold` variant to produce the first warm state."""
    import dataclasses

    import jax

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.ops.qp import WARM_ITERS
    from safe_mpc_tpu.ops.sqp import rti_step_batched

    if warm_iters is None:
        warm_iters = int(os.environ.get("BENCH_WARM_ITERS", WARM_ITERS))

    cfg = load_config().with_(N=N, use_net=use_net, alpha=alpha)
    model = ManipulatorModel(cfg)
    ctrl = get_controller(controller, model, N=N, qp_iters=qp_iters)
    mid = (model.x_min + model.x_max) / 2

    import jax.numpy as jnp
    sched = ctrl.schedule(ctrl.initial_state(jnp.asarray(mid, jnp.float32)))

    kkt = os.environ.get("BENCH_KKT", "riccati")

    def step_fn(states, xs, warm=None):
        res = rti_step_batched(ctrl.spec, states.xg, states.ug, xs,
                               sched, qp_iters=qp_iters,
                               horizon_parallel=horizon_parallel,
                               warm=warm, warm_iters=warm_iters,
                               with_warm=True, kkt=kkt)
        res, warm_out = res
        new_states = dataclasses.replace(states, xg=res.xs, ug=res.us)
        return new_states, res.us[:, 0], res.status, warm_out

    cold = jax.jit(lambda states, xs: step_fn(states, xs))
    warm = jax.jit(step_fn) if warm_iters > 0 else None
    return model, ctrl, cold, warm


def _states_for(model, ctrl, batch, seed_offset=0):
    import jax
    import jax.numpy as jnp

    from safe_mpc_tpu.tasks.sampling import sample_initial_states

    x0s = sample_initial_states(model, batch,
                                seed_offset=seed_offset,
                                margin=0.05).astype(jnp.float32)
    states = jax.vmap(lambda x: ctrl.initial_state(x))(x0s)
    return x0s, states


def _measure(cold, warm, states, x0s, reps):
    """(compile_s, steady wall_s, ok_fraction) for `reps` ticks.

    One cold tick produces the IP warm state; the timed loop runs the
    warm-started tick (the steady closed-loop regime). With warm
    disabled (BENCH_WARM_ITERS=0) every tick is the cold program."""
    import jax
    import numpy as np

    t0 = time.time()
    st, u, status, w = cold(states, x0s)
    jax.block_until_ready(u)
    if warm is not None:
        st, u, status, w = warm(st, x0s, w)
        jax.block_until_ready(u)
    compile_s = time.time() - t0
    step = warm if warm is not None else (lambda s, x, w: cold(s, x))
    t0 = time.time()
    for _ in range(reps):
        st, u, status, w = step(st, x0s, w)
    jax.block_until_ready(u)
    wall = time.time() - t0
    ok = float(np.mean(np.asarray(status) == 0))
    return compile_s, wall, ok


def suite_headline(backend):
    N = 25
    # 640 = 5 x 128 lanes: measured optimum for the WI=4 warm tick
    # (10.2k solves/s vs 9.8k at 512 and 10.0k at 768, round 5)
    batch = int(os.environ.get("BENCH_BATCH", "640" if backend != "cpu"
                               else "128"))
    reps = int(os.environ.get("BENCH_REPS", "20"))
    use_net = os.environ.get("BENCH_NET", "1") == "1"
    model, ctrl, cold, warm = _build_step("receding", N, 10.0, use_net)
    x0s, states = _states_for(model, ctrl, batch)
    compile_s, wall, ok = _measure(cold, warm, states, x0s, reps)
    solves_per_s = batch * reps / wall
    from safe_mpc_tpu.ops.qp import WARM_ITERS as _WI
    wi = int(os.environ.get("BENCH_WARM_ITERS", _WI))
    result = {
        "metric": "rti_solves_per_s",
        "value": round(float(solves_per_s), 1),
        "unit": "solves/s",
        "vs_baseline": round(float(solves_per_s) / 200.0, 2),
    }
    extra = {
        "backend": backend, "batch": batch, "horizon": N, "reps": reps,
        "use_net": use_net,
        # ADVICE r3: the headline runs the warm-started IP schedule
        # (warm_iters per tick after one cold tick) — the steady
        # closed-loop regime; apps/mpc.py's deployed path is the cold
        # 15-iteration schedule unless IPWarm is threaded. Tagged here
        # so the two are never conflated.
        "warm_iters": wi if warm is not None else 0,
        "per_tick_latency_ms": round(1e3 * wall / reps, 3),
        "compile_s": round(compile_s, 1), "ok_fraction": round(ok, 3),
    }
    print(json.dumps(result))
    print(json.dumps({"detail": extra}), file=sys.stderr)


def suite_latency(backend):
    """Per-tick latency quantiles at small batch vs the 5 ms budget.

    The reference's real-time contract is one RTI solve per dt=5 ms tick
    (config.yaml:7); its own 99% quantile report is mpc.py:300-303. Here
    each tick is timed individually (block_until_ready per call).
    """
    import jax
    import numpy as np

    N = int(os.environ.get("BENCH_HORIZON", "25"))
    reps = int(os.environ.get("BENCH_REPS", "200"))
    use_net = os.environ.get("BENCH_NET", "1") == "1"
    out = []

    # ---- on-chip per-tick latency: K ticks chained inside ONE program
    # (lax.scan), so the host<->device dispatch (the axon tunnel costs
    # ~30 ms RTT per call on this rig) is amortized away — this is the
    # number to hold against the 5 ms real-time budget
    import dataclasses as _dc

    import jax.numpy as jnp
    from safe_mpc_tpu.ops.sqp import rti_step_batched as _rti

    K = int(os.environ.get("BENCH_CHAIN", "100"))
    from safe_mpc_tpu.ops.qp import WARM_ITERS
    warm_iters = int(os.environ.get("BENCH_WARM_ITERS", WARM_ITERS))
    for hp in (False, True):
        model, ctrl, _, _ = _build_step("receding", N, 10.0, use_net,
                                        horizon_parallel=hp)
        sched = ctrl.schedule(ctrl.initial_state(
            jnp.asarray((model.x_min + model.x_max) / 2, jnp.float32)))

        @jax.jit
        def chain(states, xs):
            # one cold tick produces the IP warm state, then K-1 warm
            # -started ticks (the steady closed-loop regime)
            res0, w0 = _rti(ctrl.spec, states.xg, states.ug, xs, sched,
                            qp_iters=15, horizon_parallel=hp,
                            with_warm=True)
            st0 = _dc.replace(states, xg=res0.xs, ug=res0.us)

            def tick(carry, _):
                st, w = carry
                if warm_iters > 0:
                    res, w = _rti(ctrl.spec, st.xg, st.ug, xs, sched,
                                  horizon_parallel=hp, warm=w,
                                  warm_iters=warm_iters, with_warm=True)
                else:
                    res = _rti(ctrl.spec, st.xg, st.ug, xs, sched,
                               qp_iters=15, horizon_parallel=hp)
                return (_dc.replace(st, xg=res.xs, ug=res.us), w), \
                    res.us[:, 0]
            (st, _), us = jax.lax.scan(tick, (st0, w0), None, length=K - 1)
            return us

        # assoc only at B=1 (its latency regime): the B=8 chained assoc
        # program is too large for the remote compile worker
        for batch in ((1,) if hp else (1, 8)):
            x0s, states = _states_for(model, ctrl, batch)
            jax.block_until_ready(chain(states, x0s))  # compile + warm
            # VERDICT r3 weak #3: a single timing became a committed
            # wrong number — time the chain n_time times, report the
            # MEDIAN and carry the spread so one glitch cannot decide
            # `within_budget`.
            n_time = int(os.environ.get("BENCH_TIMINGS", "5"))
            samples = np.empty(n_time)
            for i in range(n_time):
                t0 = time.perf_counter()
                jax.block_until_ready(chain(states, x0s))
                samples[i] = 1e3 * (time.perf_counter() - t0) / K
            ms = float(np.median(samples))
            line = {
                "metric": "rti_tick_onchip_ms", "batch": batch,
                "value": round(ms, 3), "unit": "ms_per_tick",
                "min": round(float(samples.min()), 3),
                "max": round(float(samples.max()), 3),
                "timings": n_time,
                "budget_ms": 5.0, "within_budget": bool(ms < 5.0),
                "riccati": "assoc" if hp else "scan", "horizon": N,
                "chain": K, "backend": backend, "use_net": use_net,
                "warm_iters": warm_iters,
            }
            out.append(line)
            print(json.dumps(line), flush=True)

    # ---- host-side dispatch latency (includes the remote-tunnel RTT)
    for hp in (False, True):
        model, ctrl, cold, warm = _build_step("receding", N, 10.0, use_net,
                                              horizon_parallel=hp)
        step = warm if warm is not None else (lambda s, x, w: cold(s, x))
        for batch in (1, 8, 64):
            x0s, states = _states_for(model, ctrl, batch)
            st, u, _, w = cold(states, x0s)
            jax.block_until_ready(u)
            st, u, _, w = step(st, x0s, w)
            jax.block_until_ready(u)
            times = np.empty(reps)
            for i in range(reps):
                t0 = time.perf_counter()
                st, u, _, w = step(st, x0s, w)
                jax.block_until_ready(u)
                times[i] = time.perf_counter() - t0
            ms = 1e3 * times
            line = {
                "metric": "rti_tick_latency_ms", "batch": batch,
                "value": round(float(np.percentile(ms, 99)), 3),
                "unit": "ms_p99",
                "p50": round(float(np.percentile(ms, 50)), 3),
                "mean": round(float(ms.mean()), 3),
                "budget_ms": 5.0,
                "within_budget": bool(np.percentile(ms, 99) < 5.0),
                "riccati": "assoc" if hp else "scan",
                "horizon": N,
                "backend": backend, "use_net": use_net,
                "warm_iters": warm_iters if warm is not None else 0,
            }
            out.append(line)
            print(json.dumps(line), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LATENCY.json")
    with open(path, "w") as f:
        json.dump({"backend": backend, "horizon": N, "reps": reps,
                   "use_net": use_net, "budget_ms": 5.0, "rows": out}, f,
                  indent=1)
    print(f"wrote {path}", file=sys.stderr)
    return out


def suite_matrix(backend):
    """BASELINE config matrix (run_all_mpc.sh:10-12): controller x alpha x
    horizon, one JSON line per cell + BENCH_MATRIX.json artifact."""
    controllers = os.environ.get(
        "BENCH_CONTROLLERS", "naive,zerovel,receding").split(",")
    alphas = [float(a) for a in os.environ.get(
        "BENCH_ALPHAS", "10,20,30,50").split(",")]
    horizons = [int(n) for n in os.environ.get(
        "BENCH_HORIZONS", "20,25,35,45").split(",")]
    batch = int(os.environ.get("BENCH_BATCH", "512" if backend != "cpu"
                               else "64"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    use_net = os.environ.get("BENCH_NET", "1") == "1"

    cells = []
    for cont in controllers:
        for N in horizons:
            for alpha in alphas:
                if cont == "naive" and alpha != alphas[0]:
                    continue  # alpha only gates the safe set
                model, ctrl, cold, warm = _build_step(cont, N, alpha, use_net)
                x0s, states = _states_for(model, ctrl, batch)
                compile_s, wall, ok = _measure(cold, warm, states, x0s, reps)
                line = {
                    "metric": "rti_solves_per_s", "controller": cont,
                    "horizon": N, "alpha": alpha,
                    "value": round(batch * reps / wall, 1),
                    "unit": "solves/s",
                    "vs_baseline": round(batch * reps / wall / 200.0, 2),
                    "per_tick_latency_ms": round(1e3 * wall / reps, 3),
                    "batch": batch, "ok_fraction": round(ok, 3),
                    "compile_s": round(compile_s, 1),
                    "backend": backend, "use_net": use_net,
                }
                cells.append(line)
                print(json.dumps(line), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_MATRIX.json")
    with open(path, "w") as f:
        json.dump({"backend": backend, "batch": batch, "reps": reps,
                   "use_net": use_net, "cells": cells}, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


def main():
    backend = _setup()
    suite = os.environ.get("BENCH_SUITE", "headline")
    if suite == "headline":
        suite_headline(backend)
    elif suite == "latency":
        suite_latency(backend)
    elif suite == "matrix":
        suite_matrix(backend)
    else:
        raise SystemExit(f"unknown BENCH_SUITE {suite!r}")


if __name__ == "__main__":
    main()
