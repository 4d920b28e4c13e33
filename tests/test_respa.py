"""Multi-timestep r-RESPA integrator tests (impulse / Verlet-I splitting).

The reference plugin leaves integration to its host framework (SURVEY §1
L0); the engine's L0 replacement includes a multi-timestep integrator
(OpenMM MTSIntegrator analog): bonded (fast) velocity-Verlet substeps
inside half-step impulse kicks from the charge-flux nonbonded (slow)
force.  Contract tests: n_inner=1 collapses to plain velocity-Verlet /
BAOAB, energy is conserved at outer steps well past the whole-step OH
stability limit, and momentum stays zero.
"""

import jax
import jax.numpy as jnp
import numpy as np

import chargeflux_tpu as cf
from chargeflux_tpu.integrate import (
    init_state_nb,
    kinetic_energy,
    langevin_trajectory_nb,
    make_nb_energy_fn,
    make_respa_force_fns,
    respa_langevin_trajectory_nb,
    respa_trajectory_nb,
)
from chargeflux_tpu.models import water_bonded_params, water_box


def _setup(n_side=3, seed=71):
    force, pos, masses, box = water_box(n_side=n_side, flux="bond_angle",
                                        cutoff=0.45, seed=seed)
    system = force.create_system(box=box, dtype=jnp.float64)
    bonded = water_bonded_params(system.n_atoms // 3, box=box,
                                 dtype=jnp.float64)
    return system, bonded, jnp.asarray(pos), jnp.asarray(np.asarray(masses))


def _thermal(masses, T, seed):
    rng = np.random.default_rng(seed)
    m = np.asarray(masses)
    v = np.sqrt(cf.BOLTZ * T / m)[:, None] * rng.standard_normal((len(m), 3))
    v -= (m[:, None] * v).sum(0) / m.sum()
    return jnp.asarray(v)


def test_respa_n_inner_1_matches_verlet():
    """With one inner substep the impulse splitting is plain velocity
    Verlet on the total force (kicks differ only by float summation
    order)."""
    from chargeflux_tpu.integrate import nve_trajectory_nb

    system, bonded, x, m = _setup()
    v0 = _thermal(m, 150.0, 72)

    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    s0 = init_state_nb(x, v0, e_fn, init_nb)
    ref, _ = nve_trajectory_nb(s0, e_fn, init_nb, m, dt=5e-4, n_steps=40,
                               rebuild_every=10)

    slow_fn, fast_fn, init_nb2 = make_respa_force_fns(system, bonded)
    s0r = init_state_nb(x, v0, e_fn, init_nb)
    got, etots = respa_trajectory_nb(s0r, slow_fn, fast_fn, init_nb2, m,
                                     dt=5e-4, n_inner=1, n_steps=40,
                                     rebuild_every=10)
    assert etots.shape == (40,)
    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(ref.positions),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.velocities),
                               np.asarray(ref.velocities),
                               rtol=0, atol=1e-7)


def test_respa_conserves_energy_past_whole_step_limit():
    """Outer 3.0 fs / inner 0.5 fs conserves energy; 3.0 fs as a
    single-tier velocity-Verlet step is past the OH-stretch stability
    limit (~2.9 fs for k=462750, mu=0.95) and the run diverges to NaN.
    Measured on this 81-atom box: RESPA drift 0.075 at 3 fs (bounded
    impulse-MTS oscillation; the flux-charge chain rule puts some fast
    components in the slow tier), VV at 3 fs -> NaN; at a matched 2 fs,
    RESPA 0.054 vs VV 0.107."""
    from chargeflux_tpu.integrate import nve_trajectory_nb

    system, bonded, x, m = _setup(seed=73)
    v0 = _thermal(m, 150.0, 74)
    slow_fn, fast_fn, init_nb = make_respa_force_fns(system, bonded)
    e_fn, _ = make_nb_energy_fn(system, bonded=bonded)
    s0 = init_state_nb(x, v0, e_fn, init_nb)
    e0 = float(s0.potential + kinetic_energy(s0.velocities, m))
    ke_scale = abs(float(kinetic_energy(s0.velocities, m))) + 1.0

    _final, etots = respa_trajectory_nb(s0, slow_fn, fast_fn, init_nb, m,
                                        dt=3e-3, n_inner=6, n_steps=200,
                                        rebuild_every=10)
    etots = np.asarray(etots)
    assert np.all(np.isfinite(etots))
    drift = np.abs(etots - e0).max() / ke_scale
    assert drift <= 0.15, drift

    # single-tier VV at the same 3 fs: unstable (NaN) or far worse drift
    _f2, etots2 = nve_trajectory_nb(s0, e_fn, init_nb, m, dt=3e-3,
                                    n_steps=200, rebuild_every=10)
    etots2 = np.asarray(etots2)
    bad = (~np.isfinite(etots2)).any() or \
        np.abs(etots2 - e0).max() / ke_scale > 5.0 * drift
    assert bad


def test_respa_momentum_conserved():
    system, bonded, x, m = _setup(seed=75)
    v0 = _thermal(m, 150.0, 76)
    slow_fn, fast_fn, init_nb = make_respa_force_fns(system, bonded)
    e_fn, _ = make_nb_energy_fn(system, bonded=bonded)
    s0 = init_state_nb(x, v0, e_fn, init_nb)
    final, _ = respa_trajectory_nb(s0, slow_fn, fast_fn, init_nb, m,
                                   dt=1e-3, n_inner=2, n_steps=50,
                                   rebuild_every=10)
    p = np.asarray(jnp.sum(m[:, None] * final.velocities, axis=0))
    v_scale = float(jnp.abs(final.velocities).max()) * float(m.sum())
    assert np.all(np.abs(p) < 1e-10 * v_scale)


def test_respa_langevin_n_inner_1_matches_plain():
    """Same key schedule, n_inner=1: BAOAB-RESPA is plain BAOAB."""
    system, bonded, x, m = _setup(seed=77)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    s0 = init_state_nb(x, jnp.zeros_like(x), e_fn, init_nb)
    key = jax.random.PRNGKey(5)
    ref, kes_ref = langevin_trajectory_nb(
        s0, e_fn, init_nb, m, dt=5e-4, temperature=200.0, friction=20.0,
        key=key, n_steps=30, rebuild_every=10)

    slow_fn, fast_fn, init_nb2 = make_respa_force_fns(system, bonded)
    got, kes = respa_langevin_trajectory_nb(
        s0, slow_fn, fast_fn, init_nb2, m, dt=5e-4, n_inner=1,
        temperature=200.0, friction=20.0, key=key, n_steps=30,
        rebuild_every=10)
    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(ref.positions),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(kes), np.asarray(kes_ref),
                               rtol=1e-7)


def test_respa_langevin_thermalizes_cell_route():
    """NVT RESPA on the production cell route: heats from rest toward the
    target and the neighbor freshness guard stays quiet."""
    force, pos, masses, box = water_box(n_side=10, seed=78)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    bonded = water_bonded_params(system.n_atoms // 3, box=box,
                                 dtype=jnp.float64)
    slow_fn, fast_fn, init_nb = make_respa_force_fns(system, bonded)
    e_fn, _ = make_nb_energy_fn(system, bonded=bonded)
    x = jnp.asarray(pos)
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    s0 = init_state_nb(x, jnp.zeros_like(x), e_fn, init_nb)
    # rebuild_every=3 outer steps of 1 fs: heating from rest crosses the
    # skin/2 displacement budget inside a 10-step chunk (the freshness
    # guard correctly NaN-poisons it — verified), 3 stays fresh
    s1, kes = respa_langevin_trajectory_nb(
        s0, slow_fn, fast_fn, init_nb, m, dt=1e-3, n_inner=2,
        temperature=250.0, friction=20.0, key=jax.random.PRNGKey(6),
        n_steps=30, rebuild_every=3)
    kes = np.asarray(kes)
    assert kes.shape == (30,)
    assert np.all(np.isfinite(kes))
    assert np.isfinite(float(s1.potential))
    assert kes[-1] > 0.0 and kes[-1] > kes[0]
