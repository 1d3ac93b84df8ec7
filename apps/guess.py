"""Warm-start guess generation (reference guess_acados.py / guess.py).

Samples collision-free initial states by Halton sequence, solves the
full-SQP initializer OCP for the requested controller (safe variants map
to the hard-terminal problem, utils.py:46-62) plus the naive and zerovel
problems, validates with checkGuess, falls back to the safe guess when
naive/zerovel fail (guess_acados.py:132-148), and pickles
``{'xg','ug'}`` per controller in the reference filename schema.

Unlike the reference's per-problem Python loop, every candidate solves in
one batched program; rejected candidates are resampled host-side.
"""

from __future__ import annotations

import os
import time

from _common import setup_runtime
from safe_mpc_tpu.config import config_from_args, parse_args


def main(argv=None):
    args = parse_args(argv)
    backend, dtype = setup_runtime(force_cpu=args.get("cpu", False))
    print(f"backend={backend} dtype={dtype}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.controllers.registry import get_guess_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import guess_path, save_guess
    from safe_mpc_tpu.tasks.sampling import sample_initial_states

    cfg = config_from_args(args, rti=False)
    if backend != "cpu":
        cfg = cfg.with_(dtype="float32")
    cont_name = args["controller"]
    horizon = args["horizon"]

    # tracking branch (guess_acados.py:167-227): IK on the trajectory
    # start -> cold guess -> full-SQP tracking OCP; the guess replicates
    # x test_num (per-test URDF randomization only perturbs the PLANT —
    # the reference's per-test IK + OCP use the nominal model, so its
    # loop produces test_num near-identical guesses; one solve +
    # replication is the batched equivalent)
    track = args.get("track", "none")
    traj = None
    if track != "none":
        cfg = cfg.with_(track_traj=True, traj_name=track)
    model = ManipulatorModel(cfg)
    if track != "none":
        from safe_mpc_tpu.tasks.trajectories import get_trajectory
        traj = get_trajectory(cfg, track, N=horizon)
        traj = traj[:, : cfg.n_steps + 1 + horizon]
    test_num = args.get("batch") or cfg.test_num

    names = [cont_name]
    if cont_name not in ("naive", "zerovel"):
        names += ["naive", "zerovel"]
    ctrls = {n: get_guess_controller(n, model, N=horizon,
                                     rti_iters=min(cfg.nlp_max_iter, 120),
                                     traj=traj)
             for n in dict.fromkeys(names)}

    def solver_for(ctrl):
        def run(x0):
            st = ctrl.initial_state(x0)
            sched = ctrl.schedule(st)
            res = ctrl.solve(st, x0, sched)
            ok = jnp.logical_and(res.status == 0,
                                 ctrl.check_guess(res.xs, res.us))
            return res.xs, res.us, ok
        return jax.jit(jax.vmap(run))

    t0 = time.time()
    main_ctrl = ctrls[cont_name]
    dt = jnp.float64 if dtype == "float64" else jnp.float32

    if track != "none":
        from safe_mpc_tpu.tasks.ik import solve_ik_multistart

        x0, ok = solve_ik_multistart(model, jnp.asarray(traj[:, 0], dt))
        if not bool(ok):
            raise SystemExit("IK on the trajectory start did not converge")
        data = {}
        # solve each controller's tracking OCP once from the IK start
        for n in names:
            solve_n = solver_for(ctrls[n])
            xs, us, okg = solve_n(x0[None].astype(dt))
            okb = bool(np.asarray(okg)[0])
            print(f"  {n}: tracking guess "
                  f"{'accepted' if okb else 'FAILED -> fallback'}")
            if n == cont_name and not okb:
                raise SystemExit("tracking guess failed for the main "
                                 "controller")
            if okb:
                data[n] = (np.tile(np.asarray(xs), (test_num, 1, 1)),
                           np.tile(np.asarray(us), (test_num, 1, 1)))
            else:   # fall back to the safe guess (guess_acados.py:211-224)
                data[n] = data[cont_name]
        for n, (xs, us) in data.items():
            path = guess_path(cfg, n, horizon)
            save_guess(path, xs, us)
            print(f"saved {path}")
        print(f"elapsed {time.time() - t0:.1f}s")
        return

    accepted_x, accepted_xs, accepted_us = [], [], []
    offset = 0
    solve_main = solver_for(main_ctrl)
    # fixed-size chunks keep the batched full-SQP program bounded (the
    # remote TPU worker is fragile above ~32 problems x N=45 x 120 iters)
    chunk = min(int(os.environ.get("GUESS_CHUNK", "32")), test_num)
    while sum(a.shape[0] for a in accepted_x) < test_num:
        x0s = sample_initial_states(model, chunk, seed_offset=offset)
        x0s = x0s.astype(dt)
        offset += chunk * 4
        xs, us, ok = solve_main(x0s)
        okn = np.asarray(ok)
        got = sum(a.shape[0] for a in accepted_x) + int(okn.sum())
        print(f"  batch accepted {okn.sum()}/{len(okn)} "
              f"(total {min(got, test_num)}/{test_num})", flush=True)
        accepted_x.append(np.asarray(x0s)[okn])
        accepted_xs.append(np.asarray(xs)[okn])
        accepted_us.append(np.asarray(us)[okn])
    x0s = np.concatenate(accepted_x)[:test_num]
    data = {cont_name: (np.concatenate(accepted_xs)[:test_num],
                        np.concatenate(accepted_us)[:test_num])}

    # naive / zerovel guesses for the SAME x0s, falling back to the safe
    # guess on failure (guess_acados.py:132-148)
    for n in names[1:]:
        solve_n = solver_for(ctrls[n])
        xs_l, us_l, ok_l = [], [], []
        for a in range(0, test_num, chunk):
            b = min(a + chunk, test_num)
            sel = np.arange(a, b)
            if b - a < chunk:   # pad to the compiled shape
                sel = np.concatenate([sel, np.full(chunk - (b - a), a)])
            xs, us, ok = solve_n(jnp.asarray(x0s[sel]))
            xs_l.append(np.asarray(xs)[:b - a])
            us_l.append(np.asarray(us)[:b - a])
            ok_l.append(np.asarray(ok)[:b - a])
        xs, us = np.concatenate(xs_l), np.concatenate(us_l)
        okn = np.concatenate(ok_l)[:, None, None]
        xs = np.where(okn, xs, data[cont_name][0])
        us = np.where(okn, us, data[cont_name][1])
        print(f"  {n}: {int(okn.sum())}/{test_num} native, rest fell back")
        data[n] = (xs, us)

    # TEST_NOISE replication: one guess shared by all noise realizations
    # (guess_acados.py:150-158)
    if cfg.noise > 0 or cfg.control_noise > 0:
        for n in data:
            xs, us = data[n]
            data[n] = (np.tile(xs[:1], (test_num, 1, 1)),
                       np.tile(us[:1], (test_num, 1, 1)))

    for n, (xs, us) in data.items():
        path = guess_path(cfg, n, horizon)
        save_guess(path, xs, us)
        print(f"saved {path}")
    print(f"elapsed {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
