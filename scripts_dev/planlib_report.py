"""Summarize an offline plan library (apps/plan_library.py npz) into the
far-failure ground-truth document (VERDICT r4 task 3).

The library's pass 2 (N=480, retreat-via-home / high-retreat menu) IS the
far-ground-truth experiment of scripts_dev/far_ground_truth.py, run over
every problem of the flagship guess: for each problem it records the best
long-horizon f64 plan over the full anchor menu and its terminal EE error.
A problem whose best plan ends within 20 mm of the target is PROVEN
reachable from its initial state (reference acceptance semantics:
guess_acados.py:118-131 — status in {0,2} + checkGuess); one that doesn't
is a documented negative result.

Usage: python scripts_dev/planlib_report.py <planlib.npz> [out.md]
"""

from __future__ import annotations

import sys

import numpy as np

# round-4 census buckets (scripts_dev/census.py on the committed 75/100
# flagship artifact): the 25 unconverged problems by final EE error
NEAR_R4 = [69, 1, 13, 10, 0, 79, 57, 45, 70, 54, 20]   # 1.4-9.7 mm
WEDGE_R4 = [63, 75, 86, 81, 72, 22, 38]                # 45-60 mm wedge band
MID_R4 = [92, 65]                                      # ~110 mm
FAR_R4 = [36, 64, 97, 37, 29]                          # 305-523 mm


def main(argv):
    path = argv[0]
    out_md = argv[1] if len(argv) > 1 else "docs/far_ground_truth.md"
    lib = np.load(path, allow_pickle=False)
    xs, length = lib["xs"], lib["length"]
    status, err_T, tag = lib["status"], lib["err_T"], lib["tag"]
    B = xs.shape[0]
    feas = status == 0
    good = feas & (err_T < 0.02)

    lines = []
    lines.append("# Far-failure ground truth (offline f64 plan library)\n")
    n_esc = int((length > 320).sum())
    lines.append(
        f"Generated from `{path}` (apps/plan_library.py): per problem, the\n"
        "best N=320 f64 plan over the online seed menu (pass 1); problems\n"
        "whose best plan ends more than 20 mm out escalate to N=480 with\n"
        "the retreat-via-home / high-retreat menu of\n"
        "scripts_dev/far_ground_truth.py (pass 2 — this library needed "
        f"{n_esc} escalations). Acceptance mirrors the reference's\n"
        "initializer semantics (guess_acados.py:118-131).\n")
    lines.append(f"**{int(feas.sum())}/{B} problems have a feasible plan; "
                 f"{int(good.sum())}/{B} reach within 20 mm of the "
                 "target.**\n")

    def table(idx, title):
        lines.append(f"\n## {title}\n")
        lines.append("| problem | best err_T [mm] | status | horizon | "
                     "winning guess |")
        lines.append("|---|---|---|---|---|")
        for p in idx:
            lines.append(
                f"| {p} | {err_T[p] * 1000:8.2f} | {int(status[p])} | "
                f"{int(length[p])} | {str(tag[p])} |")

    table(FAR_R4, "The 5 round-4 far failures (305-523 mm at episode end)")
    table(WEDGE_R4, "The round-4 wedge-band enders (45-60 mm)")
    table(MID_R4, "The round-4 mid failures (~110 mm)")
    table(NEAR_R4, "The 11 round-4 near-misses (1.4-9.7 mm)")

    bad = np.flatnonzero(~good)
    if bad.size:
        table(bad, "All problems NOT proven within 20 mm (residual)")
    else:
        lines.append("\nEvery problem in the flagship set is proven "
                     "reachable offline.\n")

    lines.append("\n## Distribution\n")
    for lo, hi in [(0, 0.002), (0.002, 0.01), (0.01, 0.02), (0.02, 0.05),
                   (0.05, 0.15), (0.15, np.inf)]:
        n = int(((err_T >= lo) & (err_T < hi)).sum())
        lines.append(f"- err_T in [{lo * 1000:.0f}, "
                     f"{hi * 1000 if np.isfinite(hi) else np.inf:.0f}) mm: "
                     f"{n}")
    txt = "\n".join(lines) + "\n"
    with open(out_md, "w") as f:
        f.write(txt)
    print(txt)
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main(sys.argv[1:])
