"""Failure/cost vs noise-level plots (reference plot_data_noise.py):
aggregates the per-noise scores pickles from apps/metrics_count_fails.py
across noise levels and margins."""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from _common import setup_runtime


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--system", type=str, default="z1")
    parser.add_argument("--horizon", type=int, default=45)
    parser.add_argument("--noises", type=float, nargs="+",
                        default=[0.0, 2.5, 5.0, 7.5, 10.0])
    parser.add_argument("--control_noise", type=float, default=0.0)
    parser.add_argument("--data_dir", type=str, default="data_noise")
    args = parser.parse_args(argv)
    setup_runtime(force_cpu=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fails, costs = {}, {}
    for noise in args.noises:
        path = os.path.join(
            args.data_dir,
            f"{args.system}_{args.horizon}hor_noise{noise}_"
            f"cn{args.control_noise}_scores.pkl")
        if not os.path.isfile(path):
            continue
        with open(path, "rb") as f:
            scores = pickle.load(f)
        for c, d in scores.items():
            fails.setdefault(c, []).append((noise, d["fails"]))
            ok = [x for x in d["costs"] if x >= 0]
            costs.setdefault(c, []).append((noise, float(np.mean(ok))
                                            if ok else np.nan))
    if not fails:
        print("no per-noise scores found — run apps/metrics_count_fails.py")
        return
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    for c in fails:
        f = np.asarray(fails[c])
        k = np.asarray(costs[c])
        axes[0].plot(f[:, 0], f[:, 1], "-o", label=c)
        axes[1].plot(k[:, 0], k[:, 1], "-o", label=c)
    axes[0].set_xlabel("model noise [%]"), axes[0].set_ylabel("failures")
    axes[1].set_xlabel("model noise [%]"), axes[1].set_ylabel("mean cost")
    axes[0].legend(fontsize=8)
    out = os.path.join(args.data_dir, f"{args.system}_noise_sweep.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
