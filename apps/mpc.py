"""Closed-loop MPC experiment driver (reference scripts/mpc.py).

Loads the guess pickle, builds the requested controller + SafeBackup,
runs the batched noisy closed loop (the reference's per-test Python loop
becomes one vmapped program), prints the outcome summary and the 99%
timing quantiles, saves the mpc pickle, and exits with the number of
collisions (mpc.py:317 — shell-level testability)."""

from __future__ import annotations

import sys
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

    from safe_mpc_tpu.controllers.base import SafeBackupController
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import (guess_path, load_guess, mpc_path,
                                            save_mpc_result)
    from safe_mpc_tpu.sim.closed_loop import ClosedLoopSim
    from safe_mpc_tpu.utils.timing import print_quantiles, profile_controller

    cfg = config_from_args(args, rti=True)
    if backend != "cpu":
        cfg = cfg.with_(dtype="float32")
    model = ManipulatorModel(cfg)
    cont_name = args["controller"]
    horizon = args["horizon"]

    track = args.get("track", "none")
    traj = None
    if track != "none":
        # tracking task: EE reference trajectory + IK-seeded start
        # (reference guess_acados.py:167-227 tracking branch)
        from safe_mpc_tpu.tasks.ik import solve_ik_multistart
        from safe_mpc_tpu.tasks.trajectories import get_trajectory

        cfg = cfg.with_(track_traj=True, traj_name=track,
                        n_steps=args.get("n_steps") or min(
                            cfg.n_steps_tracking, 2000))
        model = ManipulatorModel(cfg)
        traj = get_trajectory(cfg, track, N=horizon)
        # trajectory array must span n_steps + 1 + N columns
        traj = traj[:, : cfg.n_steps + 1 + horizon]

    # --rti_iters > 1 runs multiple SQP iterations per control step — the
    # role of the reference's IPOPT controller family (mpc_ipopt.py)
    controller = get_controller(cont_name, model, N=horizon,
                                rti_iters=args.get("rti_iters"), traj=traj,
                                lm_drop_tol=args.get("lm_drop", 0.0),
                                zv_near_tol=args.get("zv_near", 0.0),
                                wv_near_tol=args.get("wv_near", 0.0),
                                wv_weight=args.get("wv", 5.0),
                                handover_tol=args.get("handover", 0.0))
    backup = SafeBackupController(model, N=cfg.back_hor)

    if track != "none":
        import os as _os

        jdt = jnp.float64 if dtype == "float64" else jnp.float32
        test_num = args.get("batch") or cfg.test_num
        gpath = guess_path(cfg, cont_name, horizon)
        if _os.path.isfile(gpath):
            # tracking guess pickle from apps/guess.py --track
            print(f"loading tracking guess {gpath}")
            xg, ug = load_guess(gpath)
            xg, ug = xg[:test_num], ug[:test_num]
            if xg.shape[0] < test_num:
                reps = -(-test_num // xg.shape[0])
                xg = np.tile(xg, (reps, 1, 1))[:test_num]
                ug = np.tile(ug, (reps, 1, 1))[:test_num]
            x0s = jnp.asarray(xg[:, 0, :], jdt)
        else:
            # inline fallback: IK on the trajectory start + one solve
            x0, ok = solve_ik_multistart(model, jnp.asarray(traj[:, 0], jdt))
            if not bool(ok):
                print("WARNING: IK did not converge on the trajectory start")
            x0s = jnp.tile(x0.astype(jdt), (test_num, 1))
            init = controller.solve(
                controller.initial_state(x0s[0]), x0s[0],
                controller.schedule(controller.initial_state(x0s[0])))
            xg = np.tile(np.asarray(init.xs)[None], (test_num, 1, 1))
            ug = np.tile(np.asarray(init.us)[None], (test_num, 1, 1))
    else:
        gpath = guess_path(cfg, cont_name, horizon)
        print(f"loading guess {gpath}")
        xg, ug = load_guess(gpath)
        test_num = min(args.get("batch") or cfg.test_num, xg.shape[0])
        # cast to the runtime dtype (guess pickles may be f32 from a TPU
        # run while the CPU loop is f64, and vice versa)
        jdt = jnp.float64 if dtype == "float64" else jnp.float32
        xg = np.asarray(xg[:test_num], jdt)
        ug = np.asarray(ug[:test_num], jdt)
        x0s = jnp.asarray(xg[:, 0, :], jdt)
    n_steps = args.get("n_steps") or cfg.n_steps

    # model-noise ensemble: batched perturbed inertial parameters
    # (replaces the *_randomized*.urdf files, utils.py:126-171). Uses the
    # pre-generated npz from apps/generate_noise.py when present.
    if cfg.noise > 0:
        import os

        from safe_mpc_tpu.sim.artifacts import load_noise_params
        npz = os.path.join(cfg.data_dir,
                           f"{cfg.urdf_name}_noise{cfg.noise}_params.npz")
        n_avail = 0
        if os.path.isfile(npz):
            plant_params = load_noise_params(npz)
            n_avail = int(jax.tree.leaves(plant_params)[0].shape[0])
        if n_avail >= test_num:
            print(f"loading noise ensemble {npz}")
            plant_params = jax.tree.map(lambda a: a[:test_num], plant_params)
        else:
            if n_avail:
                print(f"WARNING: {npz} holds only {n_avail} < {test_num} "
                      f"realizations — generating fresh ones (run "
                      f"apps/generate_noise.py to refresh the ensemble)")
            keys = jax.random.split(jax.random.PRNGKey(1234), test_num)
            plant_params = jax.vmap(
                lambda k: model.robot.default_params.perturbed(
                    k, cfg.noise, cfg.noise, cfg.noise))(keys)
    else:
        plant_params = jax.tree.map(
            lambda a: jnp.tile(a[None], (test_num,) + (1,) * a.ndim),
            model.robot.default_params)

    replanner = None
    if args.get("replan_N"):
        from safe_mpc_tpu.controllers.registry import get_guess_controller
        from safe_mpc_tpu.sim.replan import StallReplanner
        replan_ctrl = get_guess_controller(
            cont_name, model, N=int(args["replan_N"]), rti_iters=60,
            lm=1e-3)
        # offline plan library (apps/plan_library.py; VERDICT r4 task 1):
        # seed-time f64 escapes won 24/24 vs 0/8 mid-episode, so the
        # long-horizon f64 solves are pre-computed at guess time
        import os as _os

        from safe_mpc_tpu.sim.artifacts import planlib_path
        lib = None
        plarg = args.get("planlib", "auto")
        if plarg == "auto":
            lp = planlib_path(cfg, cont_name, horizon)
            lib = lp if _os.path.isfile(lp) else None
        elif plarg != "off":
            lib = plarg
        replanner = StallReplanner(replan_ctrl, controller, library=lib)
        print(f"stall replanner on: N_replan={args['replan_N']}, "
              f"{0 if replanner.q_iks is None else len(replanner.q_iks)} "
              f"IK anchors"
              + (f", plan library {lib} "
                 f"({int(replanner.library['good'].sum())}/"
                 f"{len(replanner.library['good'])} good plans)"
                 if lib else ", no plan library"))

    # --warm: the headline-bench configuration (cross-tick IP warm start,
    # rti_iters=1) as a runnable experiment (VERDICT r4 task 9)
    warm = bool(args.get("warm"))
    if warm and controller.rti_iters > 1:
        raise SystemExit("--warm requires rti_iters <= 1 (the multi-"
                         "iteration SQP manages its own QP schedule)")
    sim = ClosedLoopSim(controller, backup=backup, warm_start=warm)
    if warm:
        print("cross-tick IP warm start ON (headline configuration)")
    t0 = time.time()
    res = sim.run(x0s, xg=jnp.asarray(xg), ug=jnp.asarray(ug),
                  n_steps=n_steps, plant_params=plant_params, verbose=True,
                  replanner=replanner, segment=args.get("segment", 100),
                  end_segment=args.get("end_segment") or None)
    wall = time.time() - t0
    n_solves = test_num * n_steps
    print(f"\nSimulated {test_num} tests x {n_steps} steps in {wall:.1f}s "
          f"({n_solves / wall:.0f} RTI solves/s incl. compile)")

    if replanner is not None:
        replanner.close()
        print(f"replans: {replanner.n_replans} solved, "
              f"{replanner.n_accepted} accepted, "
              f"{replanner.n_brakes} brake splices, "
              f"{replanner.n_finishes} finisher splices, "
              f"{replanner.n_f64} f64 jobs ({replanner.n_f64_accepted} "
              f"accepted)")
    print(f"Completed task: {len(res.conv_idx)}"
          f"\nCollisions: {len(res.collisions_idx)}"
          f"\nViable states: {len(res.viable_idx)}"
          f"\nNot converged: {len(res.unconv_idx)}")
    c = res.counters.sum(axis=0)
    print("Failing reasons:"
          f"\n\t x bounds: {c[0]}\n\t tau bounds: {c[1]}"
          f"\n\t Obstacle: {c[2]}\n\t Safe: {c[3]}\n\t Solver: {c[4]}")

    times = profile_controller(controller, x0s, reps=10)
    print_quantiles(times)

    out = mpc_path(cfg, cont_name, horizon)
    # clobber guard (VERDICT r2+r3): a partial run (batch < test_num)
    # must never overwrite the canonical full-size artifact that
    # abort.py / metrics.py consume — divert it to a scratch dir.
    if test_num < cfg.test_num or n_steps < cfg.n_steps:
        import os as _os
        scratch = _os.path.join(cfg.data_dir, "scratch")
        out = _os.path.join(scratch, _os.path.basename(out))
    save_mpc_result(out, res)
    print(f"saved {out}")
    if replanner is not None and replanner.events:
        import json as _json
        ev_path = out.replace(".pkl", "_events.json")
        with open(ev_path, "w") as f:
            # the journal sanitizes non-finite floats at the source
            # (replan.py::_ev); allow_nan=False guards the contract
            _json.dump(replanner.events, f, allow_nan=False)
        print(f"saved {ev_path}")
    sys.exit(len(res.collisions_idx))


if __name__ == "__main__":
    main()
