"""Visualize 2-D sections of the safe-set decision boundary per joint
(reference plot_safe_set.py / tests/plot_safe_set.py): for each joint j,
sweep (q_j, v_j) with the other coordinates at mid-range/zero and contour
the constraint value, overlaying the joint-bound collision bands."""

from __future__ import annotations

import os

import numpy as np

from _common import setup_runtime
from safe_mpc_tpu.config import config_from_args, parse_args


def main(argv=None):
    args = parse_args(argv)
    setup_runtime(force_cpu=True)

    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.models.safeset import create_safe_set

    cfg = config_from_args(args, rti=True)
    model = ManipulatorModel(cfg)
    sset = create_safe_set(model)
    nq = model.nq
    mid = (model.x_min + model.x_max) / 2

    fig, axes = plt.subplots(1, nq, figsize=(3.2 * nq, 3.2))
    n = 60
    for j in range(nq):
        qs = np.linspace(model.x_min[j], model.x_max[j], n)
        vs = np.linspace(model.x_min[nq + j], model.x_max[nq + j], n)
        Qg, Vg = np.meshgrid(qs, vs)
        xs = np.tile(np.concatenate([mid[:nq], np.zeros(nq)]), (n * n, 1))
        xs[:, j] = Qg.ravel()
        xs[:, nq + j] = Vg.ravel()
        vals = jax.jit(jax.vmap(
            lambda x: jnp.min(sset.value(x, cfg.alpha)
                              - jnp.asarray(sset.bounds[0], x.dtype))))(
            jnp.asarray(xs))
        Z = np.asarray(vals).reshape(n, n)
        ax = axes[j] if nq > 1 else axes
        cf = ax.contourf(Qg, Vg, Z, levels=20, cmap="RdYlGn")
        ax.contour(Qg, Vg, Z, levels=[0.0], colors="k", linewidths=2)
        ax.set_title(f"joint {j + 1}")
        ax.set_xlabel("q"), ax.set_ylabel("v")
    fig.colorbar(cf, ax=axes if nq == 1 else axes[-1])
    out = os.path.join(cfg.data_dir,
                       f"{cfg.urdf_name}_safe_set_sections.png")
    os.makedirs(cfg.data_dir, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
