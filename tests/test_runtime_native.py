"""Native C++ host runtime vs the Python oracle and the JAX engine."""

import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.models import water_box
from chargeflux_tpu.runtime import (
    cell_histogram,
    native_available,
    native_direct_energy,
    native_flux_charges,
)

from helpers import force_to_params
from oracle import compute_charges

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="no native toolchain")


def test_cell_histogram_matches_numpy_fallback():
    force, pos, _, box = water_box(n_side=3, seed=61)
    grid = (3, 3, 3)
    counts, mx = cell_histogram(pos, box, grid)
    assert counts.sum() == len(pos)
    assert mx == counts.max()


@needs_native
def test_native_charges_match_oracle():
    force, pos, _, box = water_box(n_side=3, flux="bond_angle", seed=62)
    p = force_to_params(force)
    q_ref, _ = compute_charges(pos, p, box=np.asarray(box))
    q_nat = native_flux_charges(
        pos, box, True, p["q0"],
        (np.array([b[:2] for b in p["bonds"]]).reshape(-1, 2),
         np.array([b[2:] for b in p["bonds"]]).reshape(-1, 2)),
        (np.array([a[:3] for a in p["angles"]]).reshape(-1, 3),
         np.array([a[3:] for a in p["angles"]]).reshape(-1, 2)),
        (np.zeros((0, 3)), np.zeros((0, 5))))
    np.testing.assert_allclose(q_nat, q_ref, rtol=1e-14, atol=1e-15)


@needs_native
def test_native_direct_matches_engine():
    force, pos, _, box = water_box(n_side=3, flux="bond_angle", seed=63)
    system = force.create_system(box=box, dtype=jnp.float64)
    p = force_to_params(force)
    x = jnp.asarray(pos)
    q = np.asarray(cf.effective_charges(x, system))
    e_nat, f_nat, dedq_nat = native_direct_energy(
        pos, box, q, p["sigma"], p["epsilon"],
        np.array(p["exclusions"]).reshape(-1, 2),
        force.getCutoffDistance(), system.spec.alpha)
    comps = cf.energy_components(x, system)
    e_engine = float(comps["direct"] + comps["exclusion"])
    assert e_nat == pytest.approx(e_engine, rel=1e-10)


def _native_param_arrays(p):
    """force_to_params dict -> the (idx, params) tuple-arrays the native
    wrappers take."""
    bonds = (np.array([b[:2] for b in p["bonds"]], np.int32).reshape(-1, 2),
             np.array([b[2:] for b in p["bonds"]], np.float64).reshape(-1, 2))
    angles = (np.array([a[:3] for a in p["angles"]], np.int32).reshape(-1, 3),
              np.array([a[3:] for a in p["angles"]], np.float64).reshape(-1, 2))
    waters = (np.array([w[:3] for w in p["waters"]], np.int32).reshape(-1, 3),
              np.array([w[3:] for w in p["waters"]], np.float64).reshape(-1, 5))
    return bonds, angles, waters


@needs_native
@pytest.mark.parametrize("flux", ["bond_angle", "water"])
def test_native_full_ewald_matches_oracle(flux):
    """The complete native ground truth (flux charges -> direct+exclusion ->
    self+reciprocal -> dq/dx chain rule) against the independent Python
    oracle: energy and total forces to f64 parity.  Covers all three flux
    term types across the two parametrizations."""
    from chargeflux_tpu.runtime import native_full_energy_forces
    from oracle import energy_forces_pbc, ewald_alpha_kmax

    force, pos, _, box = water_box(n_side=3, flux=flux, seed=64)
    p = force_to_params(force)
    cutoff, tol = 0.55, 1e-4
    box = np.asarray(box)
    alpha, kmax = ewald_alpha_kmax(cutoff, tol, box)
    e_ref, f_ref, _ = energy_forces_pbc(pos, p, box, cutoff, tol)
    bonds, angles, waters = _native_param_arrays(p)
    e_nat, f_nat = native_full_energy_forces(
        pos, box, p["q0"], p["sigma"], p["epsilon"],
        np.array(p["exclusions"]).reshape(-1, 2), bonds, angles, waters,
        cutoff, alpha, kmax)
    assert e_nat == pytest.approx(e_ref, rel=1e-12)
    np.testing.assert_allclose(f_nat, f_ref, rtol=1e-9, atol=1e-10)


@needs_native
@pytest.mark.slow
def test_native_full_ewald_matches_oracle_4k():
    """Full-contract parity at ~4k atoms (the oracle's practical ceiling;
    beyond this only the native ground truth is usable)."""
    from chargeflux_tpu.runtime import native_full_energy_forces
    from oracle import energy_forces_pbc, ewald_alpha_kmax

    force, pos, _, box = water_box(n_side=11, flux="bond_angle", seed=65)
    p = force_to_params(force)
    cutoff, tol = 0.8, 1e-4
    box = np.asarray(box)
    alpha, kmax = ewald_alpha_kmax(cutoff, tol, box)
    e_ref, f_ref, _ = energy_forces_pbc(pos, p, box, cutoff, tol)
    bonds, angles, waters = _native_param_arrays(p)
    e_nat, f_nat = native_full_energy_forces(
        pos, box, p["q0"], p["sigma"], p["epsilon"],
        np.array(p["exclusions"]).reshape(-1, 2), bonds, angles, waters,
        cutoff, alpha, kmax)
    # 1e-11: phase-recursion + summation-order rounding across ~60k
    # k-vectors x 4k atoms (measured 1.3e-12 rel)
    assert e_nat == pytest.approx(e_ref, rel=1e-11)
    np.testing.assert_allclose(f_nat, f_ref, rtol=1e-9, atol=1e-10)


@needs_native
@pytest.mark.slow
def test_native_full_ewald_matches_engine_30k():
    """Engine parity at the 30k headline scale: the native oracle vs the
    f64 classical-Ewald (xla) engine route — energy relative error and
    force RMS to f64 parity at a scale where the Python oracle is
    unusable."""
    import jax

    from chargeflux_tpu import energy_and_forces
    from chargeflux_tpu.runtime import native_full_energy_forces

    force, pos, _, box = water_box(n_side=22, flux="bond_angle", seed=66)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell", recip_method="xla")
    e_eng, f_eng = energy_and_forces(jnp.asarray(pos, jnp.float64), system)
    e_eng, f_eng = float(e_eng), np.asarray(f_eng)

    p = force_to_params(force)
    bonds, angles, waters = _native_param_arrays(p)
    e_nat, f_nat = native_full_energy_forces(
        pos, np.asarray(box), p["q0"], p["sigma"], p["epsilon"],
        np.array(p["exclusions"]).reshape(-1, 2), bonds, angles, waters,
        force.getCutoffDistance(), system.spec.alpha, system.spec.kmax)
    assert e_nat == pytest.approx(e_eng, rel=1e-10)
    f_rms = np.sqrt(np.mean(np.sum(f_eng ** 2, axis=-1)))
    err = np.sqrt(np.mean(np.sum((f_nat - f_eng) ** 2, axis=-1))) / f_rms
    assert err < 1e-10
