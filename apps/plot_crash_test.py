"""Crash-test grid plot (reference test_schianto.py's empirical-sweep
role): failure / safe-abort fractions over the velocity x horizon grid
produced by apps/crash_test.py."""

from __future__ import annotations

import argparse
import json
import os

from _common import setup_runtime


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--system", type=str, default="z1")
    parser.add_argument("-c", "--controller", type=str, default="receding")
    parser.add_argument("--data_dir", type=str, default="data_noise")
    args = parser.parse_args(argv)
    setup_runtime(force_cpu=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    path = os.path.join(args.data_dir,
                        f"{args.system}_{args.controller}_crash_test.json")
    with open(path) as f:
        grid = json.load(f)

    hs = sorted({int(k.split("_")[0][1:]) for k in grid})
    vs = sorted({float(k.split("_v")[1]) for k in grid})
    fails = np.zeros((len(vs), len(hs)))
    viable = np.zeros_like(fails)
    for k, cell in grid.items():
        h = int(k.split("_")[0][1:])
        v = float(k.split("_v")[1])
        fails[vs.index(v), hs.index(h)] = cell["fails"] / cell["of"]
        viable[vs.index(v), hs.index(h)] = cell["viable"] / cell["of"]

    fig, axes = plt.subplots(1, 2, figsize=(9, 3.6), sharey=True)
    for ax, mat, title in ((axes[0], fails, "collision fraction"),
                           (axes[1], viable, "safe-abort fraction")):
        im = ax.imshow(mat, origin="lower", aspect="auto", cmap="viridis",
                       vmin=0, vmax=1,
                       extent=(-0.5, len(hs) - 0.5, -0.5, len(vs) - 0.5))
        ax.set_xticks(range(len(hs)), [str(h) for h in hs])
        ax.set_yticks(range(len(vs)), [str(v) for v in vs])
        ax.set_xlabel("horizon N")
        ax.set_title(title)
        for i in range(len(vs)):
            for j in range(len(hs)):
                ax.text(j, i, f"{mat[i, j]:.2f}", ha="center",
                        va="center",
                        color="w" if mat[i, j] < 0.6 else "k",
                        fontsize=8)
        fig.colorbar(im, ax=ax, fraction=0.046)
    axes[0].set_ylabel("initial |v| (rad/s)")
    fig.suptitle(f"{args.system} {args.controller} crash test")
    fig.tight_layout()
    out = path.replace(".json", ".png")
    fig.savefig(out, dpi=130)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
