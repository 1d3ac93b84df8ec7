"""Op-count floor / MFU measurement for the flagship RTI tick.

VERDICT r3 weak #8 / next-round task 7: profile one B=512 tick — FLOPs,
bytes, scan-iteration overhead; report achieved vs roofline; quantify
how much of the tick is fundamental math vs sequential-latency floor.

Method
------
- Phase-split timings (medians of `REPS` timed executions after warmup):
  transcribe_bl (linearization) alone, solve_qp_bl (QP) alone, and the
  fused rti_step_batched tick, at B in BATCHES, N=25, receding + NN set
  (the headline config).
- XLA's own cost model per compiled program (`compiled.cost_analysis()`:
  'flops', 'bytes accessed') -> achieved FLOP/s and HBM bandwidth, MFU
  vs the chip peak.
- A linear fit t(B) = t0 + k*B over the measured batches separates the
  sequential-latency floor t0 (scan trip count x per-step dispatch,
  independent of batch) from the marginal per-problem cost k.

Usage: python scripts_dev/perf_floor.py  (TPU; add --cpu for a smoke run)
Writes docs/perf_floor.json; the narrative lives in docs/perf_floor.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench: reuses its setup + builders


REPS = int(os.environ.get("PF_REPS", 9))
BATCHES = tuple(int(b) for b in os.environ.get(
    "PF_BATCHES", "64,128,256,512,1024").split(","))
N = 25
QP_ITERS = 15

# TPU v5e peaks (public: cloud.google.com/tpu/docs/v5e): 197 TFLOP/s
# bf16, 394 TOP/s int8; HBM BW 819 GB/s. XLA's f32 matmul on v5e runs
# through the MXU at ~1/2 bf16 rate; we report MFU against the bf16
# peak (conservative: real f32 peak is lower, so true MFU is higher).
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def _med_time(fn, *args, reps=REPS):
    import jax
    import numpy as np

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return float(np.median(ts)), float(ts.min()), float(ts.max())


def _cost(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception as e:  # cost model may be absent on some backends
        return {"flops": 0.0, "bytes": 0.0, "err": str(e)}


def main():
    backend = bench._setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    model, ctrl, cold, warmfn = bench._build_step(
        "receding", N, 10.0, True, qp_iters=QP_ITERS, warm_iters=6)
    spec, sched = ctrl.spec, ctrl.schedule(
        ctrl.initial_state(jnp.asarray(
            (model.x_min + model.x_max) / 2, jnp.float32)))

    from safe_mpc_tpu.ops.qp_batched import solve_qp_bl

    lin = jax.jit(lambda xg, ug, x0: spec.transcribe_bl(xg, ug, x0, sched))
    qp = jax.jit(lambda d: solve_qp_bl(d, iters=QP_ITERS))
    qp_dense = jax.jit(lambda d: solve_qp_bl(d, iters=QP_ITERS,
                                             kkt="dense"))

    # realistic linearization points: the committed guess pickle, tiled
    # to B (raw cold-start samples produce pathological QPs whose f32
    # solution is meaninglessly sensitive for EVERY backend — measured:
    # the shipped assoc backend shows the same O(10) u0 spread there)
    from safe_mpc_tpu.sim.artifacts import load_guess
    xg0, ug0 = load_guess(os.path.join(
        os.path.dirname(os.path.abspath(bench.__file__)), "data_noise",
        "z1_receding_25hor_10sm_use_netTrue__q_collision_margins"
        "_0.0_0.0_guess.pkl"))
    xg0 = jnp.asarray(xg0, jnp.float32)
    ug0 = jnp.asarray(ug0, jnp.float32)

    rows = []
    for B in BATCHES:
        print(f"# B={B} building/compiling...", flush=True)
        reps_t = -(-B // xg0.shape[0])
        xg = jnp.tile(xg0, (reps_t, 1, 1))[:B]
        ug = jnp.tile(ug0, (reps_t, 1, 1))[:B]
        x0s = xg[:, 0]
        import dataclasses as _dc
        states = _dc.replace(jax.vmap(ctrl.initial_state)(x0s),
                             xg=xg, ug=ug)
        tick_med, tick_min, tick_max = _med_time(
            lambda s, x: cold(s, x)[1], states, x0s)
        data = lin(states.xg, states.ug, x0s)
        jax.block_until_ready(data)
        lin_med, _, _ = _med_time(lin, states.xg, states.ug, x0s)
        qp_med, _, _ = _med_time(qp, data)
        qpd_med, _, _ = _med_time(qp_dense, data)
        # agreement of the dense backend on this real batch
        sol_r, sol_d = qp(data), qp_dense(data)
        du_gap = float(jnp.max(jnp.abs(sol_r.du - sol_d.du)))
        ok_d = float(jnp.mean((sol_d.status == 0).astype(jnp.float32)))

        c_tick = _cost(cold, states, x0s)
        c_lin = _cost(lin, states.xg, states.ug, x0s)
        c_qp = _cost(qp, data)
        c_qpd = _cost(qp_dense, data)

        row = {
            "batch": B,
            "tick_ms": round(tick_med * 1e3, 3),
            "tick_spread_ms": [round(tick_min * 1e3, 3),
                               round(tick_max * 1e3, 3)],
            "lin_ms": round(lin_med * 1e3, 3),
            "qp_ms": round(qp_med * 1e3, 3),
            "qp_dense_ms": round(qpd_med * 1e3, 3),
            "qp_dense_gflop": round(c_qpd["flops"] / 1e9, 3),
            "qp_dense_du_gap": round(du_gap, 6),
            "qp_dense_ok": ok_d,
            "tick_gflop": round(c_tick["flops"] / 1e9, 3),
            "lin_gflop": round(c_lin["flops"] / 1e9, 3),
            "qp_gflop": round(c_qp["flops"] / 1e9, 3),
            "tick_gb": round(c_tick["bytes"] / 1e9, 3),
            "qp_gb": round(c_qp["bytes"] / 1e9, 3),
            "tick_tflops": round(c_tick["flops"] / tick_med / 1e12, 4),
            "qp_bw_gbs": round(c_qp["bytes"] / qp_med / 1e9, 2),
            "mfu_pct": round(c_tick["flops"] / tick_med / PEAK_FLOPS
                             * 100, 4),
            "hbm_pct": round(c_qp["bytes"] / qp_med / PEAK_BW * 100, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # latency-floor fit t = t0 + k*B on the tick and the QP. Fewer than
    # 3 batch points cannot support the fit (a 2-point polyfit has
    # r2 = 0/0 = NaN — ADVICE r4: the committed smoke JSON carried a
    # bare NaN token that breaks strict JSON parsers), so skip it.
    Bs = np.asarray([r["batch"] for r in rows], float)
    fit = {}
    if len(rows) >= 3:
        for key in ("tick_ms", "qp_ms", "lin_ms"):
            ts = np.asarray([r[key] for r in rows], float)
            k, t0 = np.polyfit(Bs, ts, 1)
            var = float(np.var(ts))
            r2 = 1 - float(np.var(ts - (t0 + k * Bs))) / var if var > 0 \
                else None
            fit[key] = {"t0_ms": round(float(t0), 3),
                        "k_us_per_problem": round(float(k) * 1e3, 3),
                        "r2": round(r2, 4) if r2 is not None else None}
    out = {"backend": backend, "horizon": N, "qp_iters": QP_ITERS,
           "reps": REPS, "peak_flops": PEAK_FLOPS, "peak_bw": PEAK_BW,
           "rows": rows, "fit": fit}

    def _finite(o):
        """Strict-JSON hygiene: non-finite floats -> None (ADVICE r4)."""
        if isinstance(o, dict):
            return {k: _finite(v) for k, v in o.items()}
        if isinstance(o, list):
            return [_finite(v) for v in o]
        if isinstance(o, float) and not np.isfinite(o):
            return None
        return o

    out = _finite(out)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "perf_floor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, allow_nan=False)
    print("fit:", json.dumps(fit))
    print(f"saved {path}")


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    main()
