"""Charging free energy by thermodynamic integration with autodiff dU/dl.

The defining workflow a charge-flux engine enables: compute the electro-
static charging free energy of the solvent — base charges AND flux
couplings scaled together by a coupling parameter l — with dU/dl obtained
by ``jax.grad`` *through the system pytree* (no finite-difference
lambda windows, no reference-engine analog: the reference would need an
OpenMM custom force per window).

Because the per-particle parameters and flux couplings are pytree leaves
(system.with_particle_parameters / dataclasses.replace), E(x; l) traces
once and every lambda reuses the compiled program; dU/dl is exact.

    python examples/run_fep.py [n_side] [n_windows] [steps_per_window] [--cpu]

TI:  dF = integral_0^1 < dU/dl >_l dl   (trapezoid over the windows).
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import chargeflux_tpu as cf
from chargeflux_tpu.integrate import langevin_trajectory, make_energy_fn, \
    init_state, maxwell_velocities
from chargeflux_tpu.models import water_bonded_params, water_box


def scaled_system(system, lam):
    """Electrostatics scaled by ``lam``: base charges and all three flux
    couplings (the flux dq is itself charge, so it scales with q0).  LJ
    stays on — the standard decoupled charging leg."""
    return dataclasses.replace(
        system,
        q0=lam * system.q0,
        bond_k=lam * system.bond_k,
        angle_k=lam * system.angle_k,
        water_k1=lam * system.water_k1,
        water_k2=lam * system.water_k2,
        water_kub=lam * system.water_kub,
    )


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_win = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    temp, dt, gamma = 300.0, 5e-4, 5.0

    cutoff = min(0.9, round(0.45 * n_side * 0.3107, 2))  # <= min(box)/2
    force, pos, masses, box = water_box(n_side=n_side, flux="bond_angle",
                                        cutoff=cutoff)
    system = force.create_system(box=box, dtype=jnp.float32)
    bonded = water_bonded_params(n_side ** 3, box=box, dtype=jnp.float32)
    m = jnp.asarray(masses, jnp.float32)

    # dU/dl at traced lambda: ONE compile serves every window and every
    # sample (lam is a scalar leaf of the closed-over scaled system).
    @jax.jit
    def du_dl(x, lam):
        return jax.grad(
            lambda l: cf.energy(x, scaled_system(system, l)))(lam)

    key = jax.random.PRNGKey(0)
    lams = np.linspace(0.0, 1.0, n_win)
    means = []
    x = jnp.asarray(pos, jnp.float32)
    for lam in lams:
        sys_l = scaled_system(system, jnp.asarray(lam, jnp.float32))
        e_fn = make_energy_fn(sys_l, bonded)
        key, kv, kt = jax.random.split(key, 3)
        v = maxwell_velocities(m, temp, kv, dtype=jnp.float32)
        state = init_state(x, v, e_fn)
        # equilibrate + sample in chunks, accumulating dU/dl
        samples = []
        n_chunks = 5
        for c in range(n_chunks):
            kt, kc = jax.random.split(kt)
            state, _ = langevin_trajectory(
                state, e_fn, m, dt, temp, gamma, kc,
                n_steps // n_chunks)
            if c >= 1:  # first chunk is equilibration
                samples.append(float(du_dl(state.positions,
                                           jnp.asarray(lam, jnp.float32))))
        means.append(np.mean(samples))
        print(f"lambda={lam:.2f}  <dU/dl> = {means[-1]:10.2f} kJ/mol")

    dF = np.trapezoid(means, lams)
    print(f"\ncharging free energy (TI, {n_win} windows): "
          f"dF = {dF:.1f} kJ/mol "
          f"({dF / n_side ** 3:.2f} kJ/mol per water)")


if __name__ == "__main__":
    main()
