from .shard import (
    make_replica_sharded_energy_fn,
    make_sharded_energy_and_forces_fn,
    make_sharded_energy_fn,
)
from .replicas import replica_energy_and_forces, replica_nve_step, shard_replicas

__all__ = [
    "make_sharded_energy_fn",
    "make_sharded_energy_and_forces_fn",
    "make_replica_sharded_energy_fn",
    "replica_energy_and_forces",
    "replica_nve_step",
    "shard_replicas",
]
