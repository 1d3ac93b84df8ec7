"""TPU probe: escape-plan guess strategies from the deep cage wedges.

Sweeps {direct, via-home} interpolation x IK anchors x {receding-guess,
naive} replan specs on wedge states from the flagship pickle, all with
dynamics-consistent PD-rollout guesses. Reports status/terminal-err per
combination — the decisive data for the replanner's guess generator.
"""
from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "apps"))

from _common import setup_runtime


def main():
    backend, dtype = setup_runtime(force_cpu="--cpu" in sys.argv)
    print(f"backend={backend} dtype={dtype}", flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.base import MPCController
    from safe_mpc_tpu.controllers.registry import get_guess_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.ops.sqp import sqp_solve_batched
    from safe_mpc_tpu.tasks.ik import solve_ik_diverse

    d = pickle.load(open(
        "data_noise/z1_receding_use_netTrue_45hor_10sm_noise_0.0_"
        "control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl", "rb"))
    x = np.asarray(d["x"])[:, -1]
    cfg = load_config().with_(use_net=True)
    model = ManipulatorModel(cfg)
    ee = np.asarray(jax.vmap(model.ee_pos)(jnp.asarray(x, jnp.float32)))
    err = np.linalg.norm(ee - np.asarray(model.ee_ref)[None], axis=1)
    w53 = np.flatnonzero((err > 0.05) & (err < 0.056))[:4]
    w109 = np.flatnonzero((err > 0.10) & (err < 0.12))[:4]
    wedged = np.concatenate([w53, w109])
    B = len(wedged)
    print(f"wedged: {wedged} errs {np.round(err[wedged], 4)}", flush=True)

    anchors = solve_ik_diverse(model, jnp.asarray(model.ee_ref, jnp.float32),
                               n_anchors=4)
    print(f"{len(anchors)} anchors", flush=True)
    N = int(os.environ.get("WEDGE_N", "240"))
    dt = cfg.dt
    nq = model.nq
    q_home = np.asarray((model.x_min[:nq] + model.x_max[:nq]) / 2)

    def cosine(q0, q1, n):
        t = 0.5 * (1 - np.cos(np.linspace(0.0, np.pi, n)))
        return q0[None] + t[:, None] * (q1 - q0)[None]

    def rollout(x0, q_ref):
        v_ref = np.gradient(q_ref, dt, axis=0)
        xs = np.zeros((N + 1, 2 * nq), np.float32)
        xs[0] = x0
        us = np.zeros((N, nq), np.float32)
        for k in range(N):
            q, v = xs[k, :nq], xs[k, nq:]
            a_ff = (v_ref[k + 1] - v_ref[k]) / dt if k + 1 < N else 0.0
            u = np.clip(a_ff + 400 * (q_ref[k] - q) + 40 * (v_ref[k] - v),
                        -40, 40)
            us[k] = u
            xs[k + 1, :nq] = q + dt * v + 0.5 * dt * dt * u
            xs[k + 1, nq:] = v + dt * u
        return xs, us

    specs = {
        "recguess": get_guess_controller("receding", model, N=N,
                                         rti_iters=150, lm=1e-3),
        "naive": MPCController(model, N=N, lm=1e-3),
    }
    solve = {}
    for name, ctrl in specs.items():
        def make(ctrl):
            def f(xg, ug, x0s):
                sched = jax.vmap(lambda xx: ctrl.schedule(
                    ctrl.initial_state(xx)))(x0s)
                res = sqp_solve_batched(ctrl.spec, xg, ug, x0s, sched,
                                        max_iters=150, qp_iters=40)
                ee_T = jax.vmap(model.ee_pos)(res.xs[:, -1])
                errs = jnp.linalg.norm(
                    ee_T - jnp.asarray(model.ee_ref, jnp.float32)[None],
                    axis=1)
                return res.status, errs, res.qp_viol
            return jax.jit(f)
        solve[name] = make(ctrl)

    x0s = jnp.asarray(x[wedged], jnp.float32)
    for mode in ("direct", "viahome"):
        for a in range(len(anchors)):
            xg_l, ug_l = [], []
            for i in wedged:
                q0 = x[i, :nq].astype(np.float64)
                qa = np.asarray(anchors[a][:nq])
                if mode == "direct":
                    q_ref = cosine(q0, qa, N + 1)
                else:
                    n1 = int(0.45 * N)
                    q_ref = np.concatenate([
                        cosine(q0, q_home, n1),
                        cosine(q_home, qa, N + 1 - n1)], axis=0)
                xs, us = rollout(x[i].astype(np.float32), q_ref)
                xg_l.append(xs)
                ug_l.append(us)
            xg = jnp.asarray(np.stack(xg_l))
            ug = jnp.asarray(np.stack(ug_l))
            for sname, f in solve.items():
                st_, errs, viol = f(xg, ug, x0s)
                print(f"{mode:8s} anchor={a} spec={sname:9s}: "
                      f"status={np.asarray(st_)} "
                      f"errT={np.round(np.asarray(errs), 4)} "
                      f"viol={np.round(np.asarray(viol), 4)}", flush=True)


if __name__ == "__main__":
    main()
