"""Worker process for the multi-host simulation test (run by
tests/test_multihost.py, not collected by pytest).

Each of 2 processes owns 2 virtual CPU devices; together they form a
4-device global mesh. The worker builds the sharded RTI solver
(shard_map over the batch axis), feeds process-local shards of a global
batch, and checks the psum'd cross-host failure count — i.e. the full
multi-host path of SURVEY §2.3 (jax.distributed + DCN-style collectives)
exercised for real, in simulation."""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    proc_id = int(sys.argv[1])
    coord = sys.argv[2]
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=proc_id)
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from safe_mpc_tpu.config import load_config
    from safe_mpc_tpu.controllers.registry import get_controller
    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.parallel.mesh import (BATCH_AXIS, make_mesh,
                                            sharded_rti_solver)

    N = 4
    cfg = load_config().with_(N=N, use_net=False)
    model = ManipulatorModel(cfg)
    ctrl = get_controller("receding", model, N=N, qp_iters=8)

    mesh = make_mesh()                       # all 4 global devices
    B = 4                                    # one problem per device
    mid = jnp.asarray((model.x_min + model.x_max) / 2)
    x0s_np = np.stack([np.asarray(mid + 0.01 * i) for i in range(B)])
    x0s_np[:, model.nq:] = 0.0

    sh = NamedSharding(mesh, P(BATCH_AXIS))
    x0s = jax.make_array_from_process_local_data(sh, x0s_np[2 * proc_id:
                                                            2 * proc_id + 2])
    states_local = jax.vmap(ctrl.initial_state)(
        jnp.asarray(x0s_np[2 * proc_id: 2 * proc_id + 2]))
    states = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sh, np.asarray(a)), states_local)

    step = sharded_rti_solver(ctrl, mesh)
    u, status, fails = step(states, x0s)
    jax.block_until_ready(u)

    # the psum'd count is replicated: identical on every host; the parent
    # test asserts GLOBAL == sum of the workers' LOCAL counts
    fails = int(jax.device_get(fails))
    status_local = np.asarray(
        [s.data for s in status.addressable_shards]).reshape(-1)
    assert np.all(np.isfinite(np.asarray(
        [s.data for s in u.addressable_shards]))), "non-finite control"
    local_fails = int((status_local != 0).sum())
    print(f"RESULT proc={proc_id} local={local_fails} global={fails}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
