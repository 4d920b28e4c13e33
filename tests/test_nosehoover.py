"""Nose-Hoover chain NVT: extended-energy conservation, equilibration,
exact resumability (deterministic thermostat — the OpenMM
NoseHooverIntegrator analog of the L0 replacement)."""

import jax
import jax.numpy as jnp
import numpy as np

from chargeflux_tpu.integrate import (init_state, make_energy_fn,
                                      maxwell_velocities, temperature)
from chargeflux_tpu.models import water_bonded_params, water_cluster
from chargeflux_tpu.nosehoover import (nhc_conserved, nhc_init,
                                       nose_hoover_trajectory)
from chargeflux_tpu.units import BOLTZ


def _setup(seed=31):
    force, pos, masses = water_cluster(n_side=2, flux="bond_angle", seed=seed)
    system = force.create_system(dtype=jnp.float64)
    bonded = water_bonded_params(8, dtype=jnp.float64)
    e_fn = make_energy_fn(system, bonded)
    return e_fn, jnp.asarray(pos), jnp.asarray(np.asarray(masses),
                                               jnp.float64)


def test_nhc_extended_energy_conserved():
    """The NHC invariant H' = KE + PE + bath must be conserved by the
    dynamics — the NVT analog of NVE drift, and a much stronger check
    than temperature statistics (any force/chain-update bug breaks it)."""
    e_fn, x, m = _setup()
    n = x.shape[0]
    n_dof = 3 * n - 3
    target, tau, dt = 300.0, 0.025, 2e-4
    v0 = maxwell_velocities(m, target, jax.random.PRNGKey(4))
    state = init_state(x, v0, e_fn)
    chain = nhc_init(n_dof, target, tau, dtype=jnp.float64)
    h0 = float(nhc_conserved(state, chain, m, n_dof, target))

    traj = jax.jit(nose_hoover_trajectory,
                   static_argnames=("energy_fn", "n_steps", "n_dof"))
    s, ch, kes = traj(state, energy_fn=e_fn, masses=m, dt=dt,
                      temperature=target, tau=tau, n_steps=1500,
                      n_dof=n_dof, chain=chain)
    h1 = float(nhc_conserved(s, ch, m, n_dof, target))
    # scale: the bath exchanges ~n_dof*kT of energy with the system
    scale = n_dof * BOLTZ * target
    assert abs(h1 - h0) < 2e-3 * scale
    assert np.isfinite(np.asarray(kes)).all()


def test_nhc_equilibrates_to_target_temperature():
    e_fn, x, m = _setup(seed=77)
    n = x.shape[0]
    n_dof = 3 * n - 3
    target, tau, dt = 150.0, 0.02, 4e-4
    # start hot: 2x the target
    v0 = maxwell_velocities(m, 2 * target, jax.random.PRNGKey(9))
    state = init_state(x, v0, e_fn)

    traj = jax.jit(nose_hoover_trajectory,
                   static_argnames=("energy_fn", "n_steps", "n_dof"))
    s, ch, kes = traj(state, energy_fn=e_fn, masses=m, dt=dt,
                      temperature=target, tau=tau, n_steps=4000,
                      n_dof=n_dof)
    kes = np.asarray(kes)
    t_mean = 2.0 * kes[2000:].mean() / (n_dof * BOLTZ)
    assert abs(t_mean - target) / target < 0.15
    # the instantaneous temperature also ends sane
    assert 0.5 * target < float(temperature(s.velocities, m)) < 2.0 * target


def test_nhc_resume_is_bitwise_exact():
    """Deterministic thermostat: 100 steps in one call == 50 + 50 with the
    chain passed back, bitwise (the resume contract without any key
    bookkeeping)."""
    e_fn, x, m = _setup(seed=5)
    n_dof = 3 * x.shape[0] - 3
    target, tau, dt = 200.0, 0.03, 3e-4
    v0 = maxwell_velocities(m, target, jax.random.PRNGKey(1))
    state = init_state(x, v0, e_fn)
    kw = dict(energy_fn=e_fn, masses=m, dt=dt, temperature=target, tau=tau,
              n_dof=n_dof)

    traj = jax.jit(nose_hoover_trajectory,
                   static_argnames=("energy_fn", "n_steps", "n_dof"))
    ref, ch_ref, kes_ref = traj(state, n_steps=100, **kw)
    half, ch, kes_a = traj(state, n_steps=50, **kw)
    res, ch2, kes_b = traj(half, n_steps=50, chain=ch, **kw)

    np.testing.assert_array_equal(np.asarray(ref.positions),
                                  np.asarray(res.positions))
    np.testing.assert_array_equal(np.asarray(ref.velocities),
                                  np.asarray(res.velocities))
    np.testing.assert_array_equal(np.asarray(ch_ref.v_xi),
                                  np.asarray(ch2.v_xi))
    np.testing.assert_array_equal(
        np.asarray(kes_ref),
        np.concatenate([np.asarray(kes_a), np.asarray(kes_b)]))


def test_nhc_nb_conserved_and_resume(tmp_path):
    """The nb (cell-route, neighbor-reuse) NHC driver conserves the
    extended invariant AND resumes bitwise with the chain passed back —
    the production-path twin of the dense checks above."""
    from chargeflux_tpu.integrate import init_state_nb, make_nb_energy_fn
    from chargeflux_tpu.models import water_box
    from chargeflux_tpu.nosehoover import nose_hoover_trajectory_nb
    from chargeflux_tpu.utils import load_checkpoint, save_checkpoint

    force, pos, masses, box = water_box(n_side=8, seed=13, cutoff=0.65)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    bonded = water_bonded_params(system.n_atoms // 3, box=box,
                                 dtype=jnp.float64)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    x = jnp.asarray(pos)
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    n_dof = 3 * x.shape[0] - 3
    target, tau, dt = 250.0, 0.02, 2e-4
    kw = dict(dt=dt, temperature=target, tau=tau, rebuild_every=10,
              n_dof=n_dof)

    v0 = maxwell_velocities(m, target, jax.random.PRNGKey(2))
    s0 = init_state_nb(x, v0, e_fn, init_nb)
    ch0 = nhc_init(n_dof, target, tau, dtype=jnp.float64)
    h0 = float(nhc_conserved(s0, ch0, m, n_dof, target))

    ref, ch_ref, kes_ref = nose_hoover_trajectory_nb(
        s0, e_fn, init_nb, m, n_steps=40, chain=ch0, **kw)
    h1 = float(nhc_conserved(ref, ch_ref, m, n_dof, target))
    assert abs(h1 - h0) < 2e-3 * (n_dof * BOLTZ * target)
    assert np.isfinite(np.asarray(kes_ref)).all()

    half, ch, kes_a = nose_hoover_trajectory_nb(
        s0, e_fn, init_nb, m, n_steps=20, chain=ch0, **kw)
    path = tmp_path / "mid.npz"
    save_checkpoint(path, (half, ch), step=20)
    (restored, ch_r), _ = load_checkpoint(path, (half, ch))
    res, ch2, kes_b = nose_hoover_trajectory_nb(
        restored, e_fn, init_nb, m, n_steps=20, chain=ch_r, **kw)

    np.testing.assert_array_equal(np.asarray(ref.positions),
                                  np.asarray(res.positions))
    np.testing.assert_array_equal(np.asarray(ref.velocities),
                                  np.asarray(res.velocities))
    np.testing.assert_array_equal(np.asarray(ch_ref.v_xi),
                                  np.asarray(ch2.v_xi))
    np.testing.assert_array_equal(
        np.asarray(kes_ref),
        np.concatenate([np.asarray(kes_a), np.asarray(kes_b)]))
