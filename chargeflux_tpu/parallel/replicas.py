"""Replica-ensemble parallelism (the DP analog for MD).

vmap over a leading replica axis, sharded across a mesh axis with
jax.sharding — replicas are independent, so XLA partitions them with zero
communication.  The reference has no equivalent (single context, single
device); this is the SURVEY §2 "vmap replica ensembles" component.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..energy import _energy
from ..integrate import MDState, nve_step


def vmap_friendly_system(system):
    """Pin recip_method="xla" for vmapped ensembles on the TPU dense path.

    A vmapped pallas_call lowers to a serial per-replica grid loop, while
    the XLA classical-Ewald structure factors batch into one MXU matmul
    over all replicas — measured 1.9 vs 2.6 ms/step for 64 x 216-water
    (the single-system auto pick is pallas at that size and stands).
    Only "auto" is rewritten: an explicitly requested method is the
    user's to keep (e.g. A/B-ing the Pallas kernel on the replica
    path)."""
    spec = system.spec
    if (spec.pbc and spec.direct_method == "dense"
            and spec.recip_method == "auto"):
        return dataclasses.replace(
            system, spec=dataclasses.replace(spec, recip_method="xla"))
    return system


@jax.jit
def replica_energy_and_forces(positions_batch, system):
    """[R, N, 3] -> ([R], [R, N, 3]) batched energies/forces."""
    system = vmap_friendly_system(system)

    def ef(x):
        e, g = jax.value_and_grad(_energy)(x, system)
        return e, -g

    return jax.vmap(ef, in_axes=(0,))(positions_batch)


def shard_replicas(positions_batch, mesh: Mesh, axis_name: str = "replica"):
    """Place a [R, ...] batch with the replica axis sharded over the mesh."""
    return jax.device_put(positions_batch,
                          NamedSharding(mesh, P(axis_name)))


def replica_nve_step(states: MDState, energy_fn, masses, dt: float) -> MDState:
    """One NVE step vmapped over a leading replica axis of every MDState
    leaf.  Jit + sharded inputs => each device integrates its replicas."""
    return jax.vmap(lambda s: nve_step(s, energy_fn, masses, dt))(states)
