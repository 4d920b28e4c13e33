"""End-to-end example: replica-ensemble NVE MD (the DP analog).

Minimizes a water cluster with FIRE, spawns R perturbed replicas, shards
them over every available device (replicas are independent — XLA partitions
with zero communication), and integrates the whole ensemble in one
lax.scan on a flat packed carry.  The reference has no equivalent (single
context, single device; SURVEY §2 parallelism inventory).

    python examples/run_ensemble.py [n_replicas] [n_steps] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh

import chargeflux_tpu as cf
from chargeflux_tpu.integrate import (
    init_state, kinetic_energy, make_energy_fn, minimize_fire)
from chargeflux_tpu.models import water_bonded_params, water_cluster
from chargeflux_tpu.parallel.replicas import (
    replica_nve_trajectory, shard_replicas)


def main():
    n_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    temperature = 100.0  # K
    dt = 5e-5            # ps

    force, pos, masses = water_cluster(n_side=3, flux="bond_angle")
    system = force.create_system(dtype=jnp.float32)
    # intramolecular nonbonded pairs are excluded, so the harmonic bonded
    # terms (OpenMM's job around the reference plugin) hold each water
    # together — without them the H atoms are unbound
    bonded = water_bonded_params(3 ** 3, dtype=jnp.float32)
    e_fn = make_energy_fn(system, bonded)
    m = jnp.asarray(np.asarray(masses), jnp.float32)

    x0, e_min = minimize_fire(jnp.asarray(pos, jnp.float32), e_fn,
                              n_steps=200)
    print(f"{system.n_atoms} atoms | minimized E = {float(e_min):.3f} kJ/mol")

    rng = np.random.default_rng(0)
    batch = jnp.asarray(np.stack(
        [np.asarray(x0) + 0.005 * rng.standard_normal(x0.shape)
         for _ in range(n_replicas)]), jnp.float32)
    sigma_v = np.sqrt(cf.BOLTZ * temperature / np.asarray(masses))[:, None]
    vb = jnp.asarray(sigma_v * rng.standard_normal(batch.shape), jnp.float32)

    ndev = len(jax.devices())
    if n_replicas % ndev == 0 and ndev > 1:
        mesh = Mesh(np.array(jax.devices()), ("replica",))
        batch = shard_replicas(batch, mesh)
        vb = shard_replicas(vb, mesh)
        print(f"replicas sharded over {ndev} devices")

    states = jax.vmap(lambda x, v: init_state(x, v, e_fn))(batch, vb)
    e0 = jax.vmap(lambda s: s.potential
                  + kinetic_energy(s.velocities, m))(states)

    traj = jax.jit(replica_nve_trajectory,
                   static_argnames=("energy_fn", "n_steps"))
    t0 = time.perf_counter()
    final, etots = traj(states, energy_fn=e_fn, masses=m, dt=dt,
                        n_steps=n_steps)
    etots = np.asarray(etots)                       # [n_steps, R]
    elapsed = time.perf_counter() - t0
    drift = np.max(np.abs(etots - np.asarray(e0)[None, :]))
    print(f"{n_replicas} replicas x {n_steps} steps in {elapsed:.2f} s "
          f"({elapsed / n_steps * 1e3:.3f} ms/ensemble-step incl. compile)")
    print(f"max |E - E0| over the ensemble = {drift:.4f} kJ/mol")
    print(f"final potentials: min {float(np.min(final.potential)):.3f}  "
          f"max {float(np.max(final.potential)):.3f} kJ/mol")


if __name__ == "__main__":
    main()
