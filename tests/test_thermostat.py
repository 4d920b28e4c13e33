"""Langevin (BAOAB) thermostat and FIRE minimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

import chargeflux_tpu as cf
from chargeflux_tpu.integrate import (
    init_state,
    langevin_trajectory,
    make_energy_fn,
    minimize_fire,
)
from chargeflux_tpu.models import water_bonded_params, water_cluster


def _setup(seed=95):
    force, pos, masses = water_cluster(n_side=2, flux="bond_angle", seed=seed)
    system = force.create_system(dtype=jnp.float64)
    bonded = water_bonded_params(8, dtype=jnp.float64)
    return make_energy_fn(system, bonded), jnp.asarray(pos), jnp.asarray(masses)


def test_langevin_equilibrates_near_target_temperature():
    e_fn, x, m = _setup()
    target = 100.0
    state = init_state(x, jnp.zeros_like(x), e_fn)
    key = jax.random.PRNGKey(0)
    traj = jax.jit(langevin_trajectory,
                   static_argnames=("energy_fn", "n_steps"))
    final, kes = traj(state, energy_fn=e_fn, masses=m, dt=5e-5,
                      temperature=target, friction=200.0, key=key,
                      n_steps=4000)
    n_dof = 3 * x.shape[0]
    # instantaneous T after equilibration (strong friction, dt * gamma ~ 0.01)
    temps = 2.0 * np.asarray(kes)[3000:] / (n_dof * cf.BOLTZ)
    mean_t = float(temps.mean())
    assert np.isfinite(mean_t)
    assert 0.6 * target < mean_t < 1.4 * target, mean_t


def test_fire_minimization_lowers_energy():
    e_fn, x, _ = _setup(seed=96)
    rng = np.random.default_rng(1)
    x0 = x + 0.01 * rng.standard_normal(x.shape)
    e0 = float(e_fn(x0))
    x_min, e_min = jax.jit(minimize_fire, static_argnames=("energy_fn", "n_steps"))(
        x0, energy_fn=e_fn, n_steps=300)
    assert float(e_min) < e0
    # forces shrink
    f0 = np.abs(np.asarray(jax.grad(e_fn)(x0))).max()
    f1 = np.abs(np.asarray(jax.grad(e_fn)(x_min))).max()
    assert f1 < f0


def test_maxwell_velocities_and_temperature():
    """maxwell_velocities samples at the target kinetic temperature with
    zero net momentum; temperature() inverts it (L0 service parity with
    OpenMM's setVelocitiesToTemperature)."""
    from chargeflux_tpu.integrate import maxwell_velocities, temperature
    rng_masses = np.concatenate([np.full(400, 15.999), np.full(800, 1.008)])
    m = jnp.asarray(rng_masses)
    v = maxwell_velocities(m, 300.0, jax.random.PRNGKey(2))
    # net momentum removed exactly
    p = np.asarray(jnp.sum(m[:, None] * v, axis=0))
    assert np.all(np.abs(p) < 1e-8 * float(jnp.sum(m)))
    # sampled temperature within sqrt(2/(3N)) statistics (~2.4% at N=1200)
    t = float(temperature(v, m))
    assert abs(t - 300.0) < 5 * 300.0 * np.sqrt(2.0 / (3 * 1200))
    # per-species equipartition: heavy and light atoms both at T
    t_o = float(temperature(v[:400], m[:400]))
    t_h = float(temperature(v[400:], m[400:]))
    assert abs(t_o - 300.0) < 0.1 * 300.0
    assert abs(t_h - 300.0) < 0.1 * 300.0


def test_langevin_nb_cell_route():
    """BAOAB with neighbor-state reuse (langevin_trajectory_nb) runs on
    the cell route and thermalizes from zero velocities."""
    from chargeflux_tpu.integrate import (init_state_nb,
                                          langevin_trajectory_nb,
                                          make_nb_energy_fn)
    from chargeflux_tpu.models import water_bonded_params, water_box

    force, pos, masses, box = water_box(n_side=10, seed=4)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    bonded = water_bonded_params(system.n_atoms // 3, box=box,
                                 dtype=jnp.float64)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    x = jnp.asarray(pos)
    s0 = init_state_nb(x, jnp.zeros_like(x), e_fn, init_nb)
    s1, kes = langevin_trajectory_nb(
        s0, e_fn, init_nb, jnp.asarray(np.asarray(masses), jnp.float64),
        dt=2e-4, temperature=250.0, friction=20.0,
        key=jax.random.PRNGKey(0), n_steps=40, rebuild_every=10)
    kes = np.asarray(kes)
    assert kes.shape == (40,)
    assert np.all(np.isfinite(kes))
    assert np.isfinite(float(s1.potential))
    assert kes[-1] > 0.0 and kes[-1] > kes[0]   # heated from rest
