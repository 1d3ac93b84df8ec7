"""Score / failure plots over horizon and alpha (reference plot_results.py).

Reads the scores pickles produced by apps/metrics.py across a sweep and
plots mean cost surplus % and failure counts per controller vs horizon
and vs alpha (plot_results.py:84-149)."""

from __future__ import annotations

import argparse
import os
import pickle

from _common import setup_runtime

CONTROLLER_STYLES = {
    "naive": ("C0", "o"), "zerovel": ("C1", "s"), "st": ("C2", "^"),
    "htwa": ("C3", "v"), "receding": ("C4", "D"), "parallel": ("C5", "P"),
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--system", type=str, default="z1")
    parser.add_argument("--horizons", type=int, nargs="+",
                        default=[20, 25, 30, 35, 40, 45, 50])
    parser.add_argument("--alphas", type=float, nargs="+",
                        default=[2.0, 10.0, 20.0, 30.0, 50.0])
    parser.add_argument("--data_dir", type=str, default="data_noise")
    args = parser.parse_args(argv)
    setup_runtime(force_cpu=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def load(alpha):
        path = os.path.join(args.data_dir,
                            f"{args.system}_{int(alpha)}sm_scores.pkl")
        if os.path.isfile(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        return None

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    found_any = False
    for alpha in args.alphas:
        scores = load(alpha)
        if scores is None:
            continue
        found_any = True
        names = list(scores)
        axes[0].plot([alpha] * len(names),
                     [scores[c]["score"] for c in names], "o")
        for c in names:
            col, mk = CONTROLLER_STYLES.get(c, ("k", "x"))
            axes[0].scatter([alpha], [scores[c]["score"]], color=col,
                            marker=mk, label=c if alpha == args.alphas[0] else None)
            axes[1].scatter([alpha], [scores[c]["fails"]], color=col, marker=mk)
    if not found_any:
        print("no scores pickles found — run apps/metrics.py first")
        return
    axes[0].set_xlabel("alpha [%]"), axes[0].set_ylabel("cost surplus [%]")
    axes[1].set_xlabel("alpha [%]"), axes[1].set_ylabel("failures")
    axes[0].legend(fontsize=8)
    out = os.path.join(args.data_dir, f"{args.system}_scores.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
