"""Per-problem failure census for a flagship mpc pickle + events journal.

Usage: python scripts_dev/census.py [pickle] [--all]

For every unconverged problem prints: final/min EE error, terminal
speed, an error time-profile, and the machinery event timeline from
<pickle>_events.json (hook rounds map to sim steps via the hook order:
round k is the k-th maybe_replan call).
"""

from __future__ import annotations

import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from safe_mpc_tpu.config import config_from_args  # noqa: E402
from safe_mpc_tpu.models.manipulator import ManipulatorModel  # noqa: E402

DEFAULT = ("data_noise/z1_receding_use_netTrue_45hor_10sm_"
           "noise_0.0_control_noise0.0_q_collision_margins_0.0_0.0_mpc.pkl")


def main(argv):
    path = argv[1] if len(argv) > 1 and not argv[1].startswith("-") \
        else DEFAULT
    show_all = "--all" in argv
    cfg = config_from_args({"controller": "receding", "horizon": 45},
                           rti=True)
    model = ManipulatorModel(cfg)
    ref = np.asarray(cfg.ee_ref)
    d = pickle.load(open(path, "rb"))
    x = np.asarray(d["x"])
    ee = jax.jit(jax.vmap(model.ee_pos))

    ev_path = path.replace(".pkl", "_events.json")
    events = json.load(open(ev_path)) if os.path.exists(ev_path) else []
    by_problem: dict[int, list] = {}
    for e in events:
        for p in e.get("problems", []):
            by_problem.setdefault(p, []).append(e)

    idx = range(x.shape[0]) if show_all else d["unconv_idx"]
    rows = []
    for i in idx:
        e = np.linalg.norm(np.asarray(ee(jnp.asarray(x[i]))) - ref[None],
                           axis=1)
        v = np.abs(x[i][:, model.nq :]).max(axis=1)
        rows.append((int(i), e, v))
    rows.sort(key=lambda t: t[1][-1])

    n_steps = x.shape[1] - 1
    for i, e, v in rows:
        prof = " ".join(f"{e[k]*1000:6.0f}"
                        for k in range(0, n_steps + 1,
                                       max(1, n_steps // 10)))
        print(f"\np{i:3d}  final {e[-1]*1000:7.1f} mm   "
              f"min {e.min()*1000:7.2f} @ {e.argmin():3d}   "
              f"v_end {v[-1]:.3f}")
        print(f"      err(mm) [{prof}]")
        for ev in by_problem.get(i, []):
            kind = ev["kind"]
            extra = ""
            if "err_T" in ev:
                j = ev["problems"].index(i)
                if j < len(ev["err_T"]):
                    extra += f" err_T={ev['err_T'][j]*1000:.2f}mm"
            for key in ("certified", "spliced", "guide_only", "feasible",
                        "stale", "status"):
                if key in ev and isinstance(ev[key], list):
                    j = ev["problems"].index(i)
                    if j < len(ev[key]):
                        extra += f" {key}={ev[key][j]}"
            if "menu" in ev:
                extra += f" menu={ev['menu']}"
            if "due_round" in ev:
                extra += f" due={ev['due_round']}"
            print(f"      r{ev['round']:>2} {kind:14s}{extra}")
        # hook error trace for this problem
        hooks = [ev for ev in events if ev["kind"] == "hook"]
        if hooks:
            he = " ".join(f"{ev['err'][i]*1000:6.0f}" for ev in hooks)
            hm = " ".join(f"{'TPHF'[ev['pmode'][i]]:>6s}" for ev in hooks
                          if ev.get("pmode"))
            print(f"      hooks err(mm) [{he}]")
            if hm:
                print(f"      hooks pmode   [{hm}]  (T=track P=plan "
                      f"H=held F=fini)")


if __name__ == "__main__":
    main(sys.argv)
