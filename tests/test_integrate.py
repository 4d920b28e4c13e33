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


def test_packed_carry_modes_are_semantics_preserving():
    """Every packed-carry representation (integrate.PACKED_CARRY_MODE —
    layout/scheduling knobs only: optimization_barrier is identity, the
    flat carry is a reshape) must produce the same NVE trajectory as the
    'packed' control to rounding.  Guards the production 'xbarrier'
    default (the measured hetero fix) against semantic drift."""
    from chargeflux_tpu.integrate import (_MODES, init_state_nb,
                                          make_nb_energy_fn,
                                          nve_trajectory_nb)
    from chargeflux_tpu.models import water_bonded_params, water_box

    force, pos, masses, box = water_box(n_side=6, seed=9, cutoff=0.55)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    bonded = water_bonded_params(system.n_atoms // 3, box=box,
                                 dtype=jnp.float64)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    x = jnp.asarray(pos)
    m = jnp.asarray(np.asarray(masses), jnp.float64)

    import chargeflux_tpu.integrate as integrate
    saved = integrate.PACKED_CARRY_MODE
    try:
        results = {}
        for mm in _MODES:
            integrate.PACKED_CARRY_MODE = mm
            s0 = init_state_nb(x, jnp.zeros_like(x), e_fn, init_nb)
            s1, es = nve_trajectory_nb(s0, e_fn, init_nb, m, dt=2e-4,
                                       n_steps=10, rebuild_every=5)
            results[mm] = (np.asarray(s1.positions), np.asarray(es))
    finally:
        integrate.PACKED_CARRY_MODE = saved
    for mm in _MODES:
        np.testing.assert_allclose(results[mm][0], results["packed"][0],
                                   rtol=1e-12, atol=1e-14, err_msg=mm)
        np.testing.assert_allclose(results[mm][1], results["packed"][1],
                                   rtol=1e-12, err_msg=mm)


def test_langevin_nb_resume_exact(tmp_path):
    """Checkpoint/resume contract (SURVEY §5): running 40 NVT steps in one
    call is BITWISE identical to 20 steps -> save_checkpoint to disk ->
    load_checkpoint -> 20 more steps with advance_key.  Holds because the
    driver's final state keeps the carry forces (the values the next
    chunk's first B kick consumes) and the key chain is one split per
    rebuild chunk."""
    from chargeflux_tpu.integrate import (advance_key, init_state_nb,
                                          langevin_trajectory_nb,
                                          make_nb_energy_fn)
    from chargeflux_tpu.models import water_bonded_params, water_box
    from chargeflux_tpu.utils import load_checkpoint, save_checkpoint

    force, pos, masses, box = water_box(n_side=8, seed=7, cutoff=0.65)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    bonded = water_bonded_params(system.n_atoms // 3, box=box,
                                 dtype=jnp.float64)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    x = jnp.asarray(pos)
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    key = jax.random.PRNGKey(11)
    kw = dict(dt=2e-4, temperature=250.0, friction=20.0, rebuild_every=10)

    s0 = init_state_nb(x, jnp.zeros_like(x), e_fn, init_nb)
    ref, kes_ref = langevin_trajectory_nb(s0, e_fn, init_nb, m, key=key,
                                          n_steps=40, **kw)

    half, kes_a = langevin_trajectory_nb(s0, e_fn, init_nb, m, key=key,
                                         n_steps=20, **kw)
    path = tmp_path / "mid.npz"
    save_checkpoint(path, half, step=20)
    restored, step = load_checkpoint(path, half)
    assert step == 20
    res, kes_b = langevin_trajectory_nb(restored, e_fn, init_nb, m,
                                        key=advance_key(key, 2),
                                        n_steps=20, **kw)

    assert np.array_equal(np.asarray(ref.positions), np.asarray(res.positions))
    assert np.array_equal(np.asarray(ref.velocities),
                          np.asarray(res.velocities))
    assert np.array_equal(np.asarray(kes_ref),
                          np.concatenate([np.asarray(kes_a),
                                          np.asarray(kes_b)]))


def test_rattle_langevin_nb_resume_exact(tmp_path):
    """Same resume contract for the constrained (rigid-water) driver; the
    initial velocity projection is a linear solve, so re-projecting an
    already-projected state perturbs at most the last bits — assert to
    1e-12 relative."""
    from chargeflux_tpu.constraints import rattle_langevin_trajectory_nb
    from chargeflux_tpu.integrate import (advance_key, init_state_nb,
                                          make_nb_energy_fn)
    from chargeflux_tpu.models import rigid_water_box
    from chargeflux_tpu.utils import load_checkpoint, save_checkpoint

    force, pos, masses, box, params = rigid_water_box(n_side=5,
                                                      dtype=jnp.float64)
    system = force.create_system(box=box, dtype=jnp.float64)
    e_fn, init_nb = make_nb_energy_fn(system)
    x = jnp.asarray(pos, jnp.float64)
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    key = jax.random.PRNGKey(3)
    kw = dict(dt=1e-3, temperature=300.0, friction=10.0, params=params,
              rebuild_every=10)

    s0 = init_state_nb(x, jnp.zeros_like(x), e_fn, init_nb)
    ref, _ = rattle_langevin_trajectory_nb(s0, e_fn, init_nb, m, key=key,
                                           n_steps=40, **kw)

    half, _ = rattle_langevin_trajectory_nb(s0, e_fn, init_nb, m, key=key,
                                            n_steps=20, **kw)
    path = tmp_path / "mid.npz"
    save_checkpoint(path, half, step=20)
    restored, _ = load_checkpoint(path, half)
    res, _ = rattle_langevin_trajectory_nb(restored, e_fn, init_nb, m,
                                           key=advance_key(key, 2),
                                           n_steps=20, **kw)

    np.testing.assert_allclose(np.asarray(res.positions),
                               np.asarray(ref.positions),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.velocities),
                               np.asarray(ref.velocities),
                               rtol=1e-10, atol=1e-10)


def test_remove_com_motion():
    from chargeflux_tpu.integrate import (kinetic_energy,
                                          remove_com_motion)

    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.uniform(1.0, 16.0, 50))
    v = jnp.asarray(rng.standard_normal((50, 3)))
    v1 = remove_com_motion(v, m)
    p = np.asarray(jnp.sum(v1 * m[:, None], axis=0))
    np.testing.assert_allclose(p, 0.0, atol=1e-12)
    # relative velocities unchanged (a rigid boost)
    dv = np.asarray(v - v1)
    assert np.max(np.abs(dv - dv[0][None, :])) < 1e-12
    # removing drift can only lower the kinetic energy
    assert float(kinetic_energy(v1, m)) <= float(kinetic_energy(v, m))
    # idempotent
    np.testing.assert_allclose(np.asarray(remove_com_motion(v1, m)),
                               np.asarray(v1), atol=1e-12)


def test_position_restraints():
    from chargeflux_tpu.bonded import (flat_bottom_restraint_energy,
                                       position_restraint_energy)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((20, 3)))
    idx = jnp.asarray([2, 5, 11], jnp.int32)
    x0 = x[idx] + jnp.asarray([[0.1, 0.0, 0.0],
                               [0.0, -0.2, 0.0],
                               [0.0, 0.0, 0.05]])
    k = 100.0
    e = float(position_restraint_energy(x, idx, k, x0))
    np.testing.assert_allclose(
        e, 0.5 * 100.0 * (0.1 ** 2 + 0.2 ** 2 + 0.05 ** 2), rtol=1e-12)
    # dE/dx on a restrained atom = k (x - x0) = -k * offset; others zero
    g = np.asarray(jax.grad(
        lambda xx: position_restraint_energy(xx, idx, k, x0))(x))
    np.testing.assert_allclose(g[2], [-100.0 * 0.1, 0.0, 0.0], atol=1e-10)
    assert np.all(g[0] == 0.0)

    # flat-bottom: zero inside the radius, harmonic in the overshoot
    e_in = float(flat_bottom_restraint_energy(x, idx, k, x0, 0.5))
    assert e_in == 0.0
    e_out = float(flat_bottom_restraint_energy(x, idx, k, x0, 0.05))
    expect = 0.5 * k * ((0.1 - 0.05) ** 2 + (0.2 - 0.05) ** 2 + 0.0)
    np.testing.assert_allclose(e_out, expect, rtol=1e-10)
    # grad-safe at zero displacement
    g0 = np.asarray(jax.grad(lambda xx: flat_bottom_restraint_energy(
        xx, idx, k, xx[idx], 0.1))(x))
    assert np.all(np.isfinite(g0))
