"""Pre-generate model-noise ensembles (reference generate_urdf_noise.py).

The reference writes `test_num` perturbed URDF files per noise level
(generate_urdf_noise.py:20-36); here each ensemble is a batched
InertialParams pytree saved as one npz per noise level — loaded by
apps/mpc.py as the plant parameters."""

from __future__ import annotations

import argparse
import os

from _common import setup_runtime


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--system", type=str, default="z1")
    parser.add_argument("--noises", type=float, nargs="+",
                        default=[2.5, 5.0, 7.5, 10.0])
    parser.add_argument("--test_num", type=int, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    setup_runtime(force_cpu=args.cpu)

    import jax

    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import save_noise_params

    cfg = load_config().with_(urdf_name=args.system)
    model = ManipulatorModel(cfg)
    n = args.test_num or cfg.test_num
    for noise in args.noises:
        keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
        params = jax.vmap(
            lambda k: model.robot.default_params.perturbed(
                k, noise, noise, noise))(keys)
        path = os.path.join(cfg.data_dir,
                            f"{cfg.urdf_name}_noise{noise}_params.npz")
        save_noise_params(path, params)
        print(f"saved {path} ({n} realizations at {noise}%)")


if __name__ == "__main__":
    main()
