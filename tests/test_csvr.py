"""CSVR (Bussi velocity-rescaling) thermostat — csvr.py.

The reference ships no integrators (SURVEY §1 L0); this is part of the
L0 replacement.  Contracts pinned here:

* canonical statistics on an IDEAL GAS, where the targets are exact
  (velocity-Verlet integrates free particles exactly, so the thermostat
  is the only physics): kinetic mean = N_f kT/2, fluctuation
  std/mean = sqrt(2/N_f), relaxation from a hot start on the tau
  timescale, machine-level conserved quantity;
* on the interacting water box, the Bussi invariant (etot - work) must
  drift no worse than a matched NVE control — the thermostat
  bookkeeping adds NO error beyond the integrator's own;
* the nb driver resumes exactly on the advance_key chain.
"""

import numpy as np

import jax
import jax.numpy as jnp

from chargeflux_tpu.csvr import csvr_trajectory, csvr_trajectory_nb
from chargeflux_tpu.integrate import (advance_key, init_state,
                                      init_state_nb, make_energy_fn,
                                      make_nb_energy_fn, maxwell_velocities,
                                      nve_trajectory)
from chargeflux_tpu.models import water_bonded_params, water_box
from chargeflux_tpu.units import BOLTZ


def _ideal_gas(n=81, temp=300.0, seed=1):
    m = jnp.ones((n,), jnp.float64) * 10.0
    x = jnp.zeros((n, 3), jnp.float64)
    v = maxwell_velocities(m, temp, jax.random.PRNGKey(seed))
    e_fn = lambda xx: jnp.zeros((), jnp.float64) * jnp.sum(xx)
    return init_state(x, v, e_fn), e_fn, m


def test_ideal_gas_canonical_statistics():
    s0, e_fn, m = _ideal_gas()
    _, diag = csvr_trajectory(s0, e_fn, m, dt=1e-3, temperature=300.0,
                              tau=0.02, key=jax.random.PRNGKey(2),
                              n_steps=4000)
    n_dof = 3 * 81
    k_target = 0.5 * n_dof * BOLTZ * 300.0
    ks = np.asarray(diag["kinetic"])[500:]
    # tau = 20 steps -> ~175 independent samples; means land within a few %
    assert abs(ks.mean() - k_target) < 0.06 * k_target, (ks.mean(), k_target)
    rel_std = ks.std() / ks.mean()
    expected = np.sqrt(2.0 / n_dof)
    assert 0.6 * expected < rel_std < 1.4 * expected, (rel_std, expected)
    # free particles: the conserved quantity is exact to roundoff
    h = np.asarray(diag["etot"]) - np.asarray(diag["work"])
    assert np.max(np.abs(h - h[0])) < 1e-9 * k_target


def test_ideal_gas_relaxation_from_hot_start():
    s0, e_fn, m = _ideal_gas(temp=600.0, seed=3)
    _, diag = csvr_trajectory(s0, e_fn, m, dt=1e-3, temperature=300.0,
                              tau=0.02, key=jax.random.PRNGKey(4),
                              n_steps=1000)
    n_dof = 3 * 81
    t_series = 2.0 * np.asarray(diag["kinetic"]) / (n_dof * BOLTZ)
    assert t_series[0] > 450.0                       # genuinely hot
    t_tail = float(np.mean(t_series[-400:]))
    assert 270.0 < t_tail < 330.0, t_tail            # relaxed to target


def _water_setup(n_side=3, seed=0):
    force, pos, masses, box = water_box(n_side=n_side, flux="bond_angle",
                                        cutoff=0.42, seed=seed)
    system = force.create_system(box=box, dtype=jnp.float64)
    bonded = water_bonded_params(n_side ** 3, box=box, dtype=jnp.float64)
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    return system, bonded, jnp.asarray(pos), m


def test_invariant_drifts_no_worse_than_nve():
    """On the interacting box the conserved quantity's drift equals the
    integrator's own NVE error — the rescale bookkeeping is exact."""
    system, bonded, x, m = _water_setup()
    e_fn = make_energy_fn(system, bonded=bonded)
    v0 = maxwell_velocities(m, 300.0, jax.random.PRNGKey(1))
    s0 = init_state(x, v0, e_fn)

    _, etot_nve = nve_trajectory(s0, e_fn, m, 2e-4, 300)
    e = np.asarray(etot_nve)
    nve_drift = float(np.max(np.abs(e - e[0])))

    _, diag = csvr_trajectory(s0, e_fn, m, dt=2e-4, temperature=300.0,
                              tau=0.1, key=jax.random.PRNGKey(2),
                              n_steps=300)
    h = np.asarray(diag["etot"]) - np.asarray(diag["work"])
    assert np.all(np.isfinite(h))
    csvr_drift = float(np.max(np.abs(h - h[0])))
    # same integrator, same trajectory class: allow 2x for the perturbed path
    assert csvr_drift < 2.0 * nve_drift + 1e-6, (csvr_drift, nve_drift)


def test_nb_driver_exact_resume():
    system, bonded, x, m = _water_setup()
    e_nb, init_nb = make_nb_energy_fn(system, bonded=bonded)
    v0 = maxwell_velocities(m, 300.0, jax.random.PRNGKey(5))
    s0 = init_state_nb(x, v0, e_nb, init_nb)
    key = jax.random.PRNGKey(6)

    s_full, d_full = csvr_trajectory_nb(
        s0, e_nb, init_nb, m, dt=2e-4, temperature=300.0, tau=0.1, key=key,
        n_steps=40, rebuild_every=10)

    s_half, d_a = csvr_trajectory_nb(
        s0, e_nb, init_nb, m, dt=2e-4, temperature=300.0, tau=0.1, key=key,
        n_steps=20, rebuild_every=10)
    s_resumed, d_b = csvr_trajectory_nb(
        s_half, e_nb, init_nb, m, dt=2e-4, temperature=300.0, tau=0.1,
        key=advance_key(key, 2), n_steps=20, rebuild_every=10)

    np.testing.assert_array_equal(
        np.asarray(d_full["kinetic"]),
        np.concatenate([np.asarray(d_a["kinetic"]),
                        np.asarray(d_b["kinetic"])]))
    np.testing.assert_array_equal(np.asarray(s_full.positions),
                                  np.asarray(s_resumed.positions))
    np.testing.assert_array_equal(np.asarray(s_full.velocities),
                                  np.asarray(s_resumed.velocities))


def test_dense_driver_exact_resume():
    """The dense driver chains its key one split per step, so
    advance_key(key, n_steps) resumes it bitwise (same convention as the
    dense langevin_trajectory)."""
    s0, e_fn, m = _ideal_gas(seed=11)
    key = jax.random.PRNGKey(12)
    _, d_full = csvr_trajectory(s0, e_fn, m, dt=1e-3, temperature=300.0,
                                tau=0.02, key=key, n_steps=40)
    s_half, d_a = csvr_trajectory(s0, e_fn, m, dt=1e-3, temperature=300.0,
                                  tau=0.02, key=key, n_steps=20)
    _, d_b = csvr_trajectory(s_half, e_fn, m, dt=1e-3, temperature=300.0,
                             tau=0.02, key=advance_key(key, 20), n_steps=20)
    np.testing.assert_array_equal(
        np.asarray(d_full["kinetic"]),
        np.concatenate([np.asarray(d_a["kinetic"]),
                        np.asarray(d_b["kinetic"])]))
