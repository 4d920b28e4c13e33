"""Example: parallel-tempering REMD on charge-flux water.

Four temperature slots, fully in-jit exchange sweeps.  On a multi-chip
mesh, shard the replica axis (parallel.shard_replicas) and the same
program runs with configurations migrating across chips on swap.

    python examples/run_remd.py [n_side] [n_sweeps] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from chargeflux_tpu.integrate import (MDState, make_energy_fn,
                                      maxwell_velocities)
from chargeflux_tpu.models import water_bonded_params, water_cluster
from chargeflux_tpu.parallel import remd_langevin_trajectory
from chargeflux_tpu.units import BOLTZ


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    exchange_every = 10
    temps = [150.0, 210.0, 300.0, 420.0]
    r = len(temps)
    dt = 5e-4

    force, pos, masses = water_cluster(n_side=n_side, flux="bond_angle",
                                       seed=17)
    system = force.create_system(dtype=jnp.float32)
    bonded = water_bonded_params(n_side ** 3, dtype=jnp.float32)
    e_fn = make_energy_fn(system, bonded)
    m = jnp.asarray(np.asarray(masses), jnp.float32)
    key = jax.random.PRNGKey(0)

    xb = jnp.stack([jnp.asarray(pos, jnp.float32)] * r)
    vb = jnp.stack([maxwell_velocities(m, t, jax.random.fold_in(key, i))
                    for i, t in enumerate(temps)])
    f0 = -jax.vmap(jax.grad(e_fn))(xb)
    states = MDState(xb, vb, f0, jax.vmap(e_fn)(xb))

    final, pots, accepts = remd_langevin_trajectory(
        states, e_fn, m, dt=dt, temperatures=temps, friction=5.0,
        key=jax.random.PRNGKey(1), n_steps=n_sweeps * exchange_every,
        exchange_every=exchange_every)

    pots = np.asarray(pots)
    acc = np.asarray(accepts)
    late = pots[len(pots) // 2:]
    print(f"{n_side ** 3} waters x {r} replicas, {n_sweeps} sweeps of "
          f"{exchange_every} steps (dt {dt * 1e3:.1f} fs)")
    for i, t in enumerate(temps):
        print(f"  slot {i} T={t:5.0f} K  <PE> = {late[:, i].mean():9.2f} "
              f"kJ/mol  (kT = {BOLTZ * t:.2f})")
    print(f"swap acceptance: {acc.mean():.2f} "
          f"(per-pair {acc.mean(axis=0).round(2)})")
    assert np.isfinite(pots).all()
    print("OK")


if __name__ == "__main__":
    main()
