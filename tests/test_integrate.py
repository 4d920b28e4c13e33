"""NVE integration: energy conservation over a velocity-Verlet scan loop
(SURVEY §4 level 4).  Uses flexible water = charge-flux electrostatics +
harmonic bonded terms (the bonded forces OpenMM would supply around the
reference plugin)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.bonded import bonded_energy
from chargeflux_tpu.integrate import (
    init_state,
    kinetic_energy,
    make_energy_fn,
    nve_trajectory,
)
from chargeflux_tpu.models import water_bonded_params, water_box, water_cluster


def _thermal_velocities(masses, T, seed):
    rng = np.random.default_rng(seed)
    sigma = np.sqrt(cf.BOLTZ * T / masses)[:, None]
    return sigma * rng.standard_normal((len(masses), 3))


def _drift_run(energy_fn, pos, masses, dt, n_steps, seed, T=150.0):
    m = jnp.asarray(masses)
    v0 = jnp.asarray(_thermal_velocities(masses, T, seed))
    state = init_state(jnp.asarray(pos), v0, energy_fn)
    e0 = float(state.potential + kinetic_energy(state.velocities, m))
    traj = jax.jit(nve_trajectory, static_argnames=("energy_fn", "n_steps"))
    _, etots = traj(state, energy_fn=energy_fn, masses=m, dt=dt,
                    n_steps=n_steps)
    etots = np.asarray(etots)
    assert np.all(np.isfinite(etots))
    ke_scale = abs(float(kinetic_energy(state.velocities, m))) + 1.0
    return np.abs(etots - e0).max() / ke_scale


def test_nve_drift_cluster():
    force, pos, masses = water_cluster(n_side=2, flux="bond_angle", seed=41)
    system = force.create_system(dtype=jnp.float64)
    bonded = water_bonded_params(8, dtype=jnp.float64)
    e_fn = make_energy_fn(system, bonded)
    drift = _drift_run(e_fn, pos, masses, dt=5e-5, n_steps=400, seed=42)
    assert drift <= 0.02, drift


def test_nve_drift_pbc_box():
    force, pos, masses, box = water_box(n_side=2, flux="water", seed=43)
    system = force.create_system(box=box, dtype=jnp.float64)
    bonded = water_bonded_params(8, box=box, dtype=jnp.float64)
    e_fn = make_energy_fn(system, bonded)
    drift = _drift_run(e_fn, pos, masses, dt=5e-5, n_steps=200, seed=44)
    assert drift <= 0.02, drift


def test_nve_drift_scales_with_dt():
    """Velocity Verlet is 2nd order: halving dt shrinks drift ~4x."""
    force, pos, masses = water_cluster(n_side=2, flux="bond_angle", seed=45)
    system = force.create_system(dtype=jnp.float64)
    bonded = water_bonded_params(8, dtype=jnp.float64)
    e_fn = make_energy_fn(system, bonded)
    d1 = _drift_run(e_fn, pos, masses, dt=5e-5, n_steps=100, seed=46)
    d2 = _drift_run(e_fn, pos, masses, dt=2.5e-5, n_steps=200, seed=46)
    assert d2 < d1


def test_trajectory_is_single_compiled_program():
    """The whole loop lowers to one XLA program (scan -> while), no host
    round-trips."""
    force, pos, masses = water_cluster(n_side=2, seed=47)
    system = force.create_system(dtype=jnp.float64)
    e_fn = make_energy_fn(system)
    m = jnp.asarray(masses)
    state = init_state(jnp.asarray(pos), jnp.zeros_like(jnp.asarray(pos)), e_fn)
    jitted = jax.jit(nve_trajectory, static_argnames=("energy_fn", "n_steps"))
    lowered = jitted.lower(state, energy_fn=e_fn, masses=m, dt=2e-4, n_steps=10)
    assert "while" in lowered.as_text()
