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

    def load(alpha, horizon=None):
        tag = "" if horizon is None else f"{int(horizon)}hor_"
        path = os.path.join(args.data_dir,
                            f"{args.system}_{tag}{int(alpha)}sm_scores.pkl")
        if os.path.isfile(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        return None

    # score/fails vs horizon at each alpha (reference
    # plot_results.py:84-149), from horizon-tagged scores pickles; the
    # legacy per-alpha pickle (no horizon tag) feeds the alpha panel
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    found_any = False
    seen = set()
    for alpha in args.alphas:
        per_h = {h: s for h in args.horizons
                 if (s := load(alpha, h)) is not None}
        if not per_h:
            continue
        found_any = True
        names = sorted({c for s in per_h.values() for c in s})
        for c in names:
            col, mk = CONTROLLER_STYLES.get(c, ("k", "x"))
            hs = [h for h in sorted(per_h) if c in per_h[h]]
            lbl = c if c not in seen else None
            seen.add(c)
            axes[0].plot(hs, [per_h[h][c]["score"] for h in hs],
                         color=col, marker=mk, label=lbl)
            axes[1].plot(hs, [per_h[h][c]["fails"] for h in hs],
                         color=col, marker=mk)
    if not found_any:
        # fall back to the legacy alpha-keyed pickles
        for alpha in args.alphas:
            scores = load(alpha)
            if scores is None:
                continue
            found_any = True
            for c in scores:
                col, mk = CONTROLLER_STYLES.get(c, ("k", "x"))
                lbl = c if c not in seen else None
                seen.add(c)
                axes[0].scatter([alpha], [scores[c]["score"]], color=col,
                                marker=mk, label=lbl)
                axes[1].scatter([alpha], [scores[c]["fails"]], color=col,
                                marker=mk)
        xlabel = "alpha [%]"
    else:
        xlabel = "horizon N"
    if not found_any:
        print("no scores pickles found — run apps/metrics.py first")
        return
    axes[0].set_xlabel(xlabel), axes[0].set_ylabel("cost surplus [%]")
    axes[1].set_xlabel(xlabel), axes[1].set_ylabel("failures")
    axes[0].legend(fontsize=8)
    out = os.path.join(args.data_dir, f"{args.system}_scores.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
