"""Multi-chip scaling: problem-sharded meshes + sharded sim/solve steps.

The TPU-native replacement for the reference's serial bash sweeps
(run_all_mpc.sh; SURVEY.md §2.3 — the reference has NO parallel or
distributed execution at all). Problems (initial states x noise
realizations x alphas) shard over a 1-D device mesh; each chip solves its
shard's OCPs locally, and only scalar statistics cross chips (psum-style
reductions XLA inserts automatically from the sharded->replicated output
specs), so communication volume is negligible by design and rides ICI.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
`jax.devices()` then spans hosts and the same code scales to pod slices
over DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (BATCH_AXIS,))


def shard_batch(mesh: Mesh, tree):
    """Place a batch pytree with the leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(x0s, n: int):
    """Pad the problem batch to a multiple of the mesh size (padded rows
    are real solves whose results are dropped)."""
    B = x0s.shape[0]
    rem = (-B) % n
    if rem == 0:
        return x0s, B
    pad = jnp.tile(x0s[-1:], (rem,) + (1,) * (x0s.ndim - 1))
    return jnp.concatenate([x0s, pad], axis=0), B


def sharded_rti_solver(controller, mesh: Mesh):
    """Jitted batched RTI step with problems sharded over the mesh.

    Returns fn(states, xs) -> (u (B,nu), statuses (B,), fail_count ())
    where the fail count is a cross-chip reduction (the only collective).
    """
    batch_sh = NamedSharding(mesh, P(BATCH_AXIS))
    rep_sh = NamedSharding(mesh, P())

    def step(states, xs):
        res = jax.vmap(controller.step)(states, xs)
        fails = jnp.sum((res.status != 0).astype(jnp.int32))
        return res.u, res.status, fails

    return jax.jit(step,
                   in_shardings=(batch_sh, batch_sh),
                   out_shardings=(batch_sh, batch_sh, rep_sh))


def sharded_sim_step(sim, mesh: Mesh, plant_params):
    """One batched closed-loop tick sharded over the mesh, returning the
    new SimState plus replicated failure/abort statistics."""
    batch_sh = NamedSharding(mesh, P(BATCH_AXIS))
    rep_sh = NamedSharding(mesh, P())

    def step(st):
        st2, _ = sim.step(st, plant_params)
        stats = jnp.stack([jnp.sum(st2.failed.astype(jnp.int32)),
                           jnp.sum(st2.viable.astype(jnp.int32))])
        return st2, stats

    return jax.jit(step, in_shardings=(batch_sh,),
                   out_shardings=(batch_sh, rep_sh))
