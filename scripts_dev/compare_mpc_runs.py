"""Compare two mpc result pickles for the determinism proof (VERDICT r4
task 2): same commit + same command must give identical outcome sets and
bitwise-identical trajectories.

Usage: python scripts_dev/compare_mpc_runs.py run1.pkl run2.pkl
Exit code 0 iff the runs are identical in outcomes; prints the bitwise
trajectory verdict separately (informational — outcome identity is the
claim, bitwise identity is the stronger bonus)."""

import pickle
import sys

import numpy as np


def main(p1, p2):
    a = pickle.load(open(p1, "rb"))
    b = pickle.load(open(p2, "rb"))
    ok = True
    for k in ["conv_idx", "collisions_idx", "unconv_idx", "viable_idx"]:
        sa, sb = sorted(np.asarray(a[k]).tolist()), sorted(
            np.asarray(b[k]).tolist())
        same = sa == sb
        ok &= same
        print(f"{k}: {len(sa)} vs {len(sb)} "
              f"{'IDENTICAL' if same else 'DIFFER'}")
        if not same:
            print(f"  only in run1: {sorted(set(sa) - set(sb))}")
            print(f"  only in run2: {sorted(set(sb) - set(sa))}")
    for k in ["x", "u", "r"]:
        xa, xb = np.asarray(a[k]), np.asarray(b[k])
        if xa.shape != xb.shape:
            print(f"{k}: shape {xa.shape} vs {xb.shape} DIFFER")
            continue
        # NaN-padded tails (post-outcome steps) compare as equal
        eq = np.all((xa == xb) | (np.isnan(xa) & np.isnan(xb)))
        if eq:
            print(f"{k}: bitwise identical")
        else:
            d = np.nanmax(np.abs(xa - xb))
            n = int(np.sum(~((xa == xb) | (np.isnan(xa) & np.isnan(xb)))))
            print(f"{k}: {n} elements differ, max |delta| = {d:.3e}")
    print("OUTCOMES " + ("IDENTICAL" if ok else "DIFFER"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
