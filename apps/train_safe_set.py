"""Train a control-invariant safe-set network for the current robot/scene.

Label generation runs bisection over batched SafeBackup braking solves —
every bisection step is one batched SQP over all samples. Saves the net in
both npz form and the reference torch-checkpoint format, ready for
``use_net: true`` runs (config `network_path`)."""

from __future__ import annotations

import argparse
import os
import time

from _common import setup_runtime


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--system", type=str, default="z1")
    parser.add_argument("--samples", type=int, default=2048)
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--bisection", type=int, default=7)
    parser.add_argument("--back_hor", type=int, default=45)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--boundary_frac", type=float, default=0.5,
                        help="fraction of samples biased to low-margin "
                             "(near-obstacle / near-joint-limit) states")
    parser.add_argument("--chunk", type=int, default=64,
                        help="braking-solve chunk size (HBM cap; each "
                             "problem holds ~100 MB live during the SQP)")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out_suffix", type=str, default="",
                        help="filename suffix (e.g. _8k) so an "
                             "experimental retrain does not clobber the "
                             "deployed net")
    args = parser.parse_args(argv)
    backend, dtype = setup_runtime(force_cpu=args.cpu)
    print(f"backend={backend} dtype={dtype}")

    import numpy as np

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.tasks import train_safeset as ts

    cfg = load_config().with_(urdf_name=args.system,
                              back_hor=args.back_hor)
    if backend != "cpu":
        cfg = cfg.with_(dtype="float32")
    model = ManipulatorModel(cfg)

    t0 = time.time()
    qs, dirs, labels = ts.generate_labels(
        model, args.samples, backup_N=args.back_hor,
        bisection_iters=args.bisection, seed=args.seed, chunk=args.chunk,
        boundary_frac=args.boundary_frac, verbose=True)
    n_solves = args.samples * (args.bisection + 1)
    dt_label = time.time() - t0
    print(f"labels: {args.samples} samples, s* in "
          f"[{labels.min():.3f}, {labels.max():.3f}] "
          f"(mean {labels.mean():.3f}); {n_solves} braking solves in "
          f"{dt_label:.1f}s ({n_solves / dt_label:.0f} solves/s)")

    t0 = time.time()
    params, hist = ts.train_net(qs, dirs, labels, hidden=args.hidden,
                                epochs=args.epochs, seed=args.seed,
                                activation=cfg.act_fun)
    print(f"training: final val MSE {hist['val'][-1]:.5f} "
          f"({time.time() - t0:.1f}s)")

    nn_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "nn_models", args.system)
    os.makedirs(nn_dir, exist_ok=True)
    npz_path = os.path.join(
        nn_dir, f"{args.system}_safe_set{args.out_suffix}.npz")
    ts.save_npz(npz_path, params)
    print(f"saved {npz_path}")
    try:
        pt_path = os.path.join(
            nn_dir, f"{args.system}_safe_set{args.out_suffix}.pt")
        ts.export_torch_checkpoint(pt_path, params)
        print(f"saved {pt_path} (reference-format torch checkpoint; set "
              f"network_path in config.yaml to use it)")
    except ImportError:
        print("torch unavailable — skipped .pt export")


if __name__ == "__main__":
    main()
