#!/bin/bash
# Cross-controller comparison at the BASELINE horizon N=25 (VERDICT r4
# task 4; reference run_all_mpc.sh:10-12 + metrics.py:147-187).
# Plain closed-loop runs (no replanner) for 6 controllers on the shared
# 25-hor problem set, then multi-controller scores + plot.
# NOTE: apps/mpc.py exits with the collision count (reference
# mpc.py:317), so a nonzero exit here is data, not an error.
cd "$(dirname "$0")/.."
for c in naive zerovel st htwa parallel receding; do
  echo "=== $c ==="
  python apps/mpc.py -c "$c" --horizon 25 --batch 100 --n_steps 800 \
    > /tmp/cmp25_$c.log 2>&1
  echo "(exit $? = collisions)"
  tail -12 /tmp/cmp25_$c.log
done
python apps/metrics.py -c receding --horizon 25 2>&1 | tail -12
python apps/plot_results.py --horizons 25 45
