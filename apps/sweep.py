"""Sweep orchestration (replaces the reference's serial bash loops,
run_all_mpc.sh / run_mpc_horizons.sh / run_mpc_alphas.sh).

Per (controller, horizon, alpha) cell: generate guesses then run the
batched closed loop. Horizons are bucketed — one compiled program per N
(SURVEY.md §2.3) — while initial states, alphas and noise realizations
batch inside each program. A JSON sweep log provides shard-wise
checkpoint/resume: completed cells are skipped on restart."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def cell_id(cont, hor, alpha, noise):
    return f"{cont}_h{hor}_a{alpha}_n{noise}"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--controllers", nargs="+",
                        default=["naive", "zerovel", "st", "htwa",
                                 "receding", "parallel"])
    parser.add_argument("--horizons", type=int, nargs="+",
                        default=[20, 25, 30, 35, 40, 45, 50])
    parser.add_argument("--alphas", type=float, nargs="+",
                        default=[2.0, 10.0, 20.0, 30.0, 50.0])
    parser.add_argument("--noise", type=float, default=0.0)
    parser.add_argument("--batch", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--log", type=str, default="data_noise/sweep_log.json")
    args = parser.parse_args(argv)

    log_path = args.log
    done: dict = {}
    if os.path.isfile(log_path):
        with open(log_path) as f:
            done = json.load(f)
        print(f"resuming sweep: {len(done)} cells already complete")

    cells = [(c, h, a) for h in args.horizons for a in args.alphas
             for c in args.controllers]
    for cont, hor, alpha in cells:
        cid = cell_id(cont, hor, alpha, args.noise)
        if cid in done:
            continue
        base = ["-c", cont, "--horizon", str(hor), "--alpha", str(alpha),
                "--noise", str(args.noise)]
        if args.batch:
            base += ["--batch", str(args.batch)]
        if args.cpu:
            base += ["--cpu"]
        t0 = time.time()
        print(f"=== {cid} ===")
        g = subprocess.run([sys.executable, os.path.join(HERE, "guess.py")]
                           + base)
        m = subprocess.run([sys.executable, os.path.join(HERE, "mpc.py")]
                           + base)
        done[cid] = {"collisions": m.returncode, "guess_rc": g.returncode,
                     "elapsed_s": round(time.time() - t0, 1)}
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        with open(log_path, "w") as f:
            json.dump(done, f, indent=1)
    print(f"sweep complete: {len(done)} cells in {log_path}")


if __name__ == "__main__":
    main()
