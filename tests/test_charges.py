"""Unit tests for the charge-flux update q(x) and its analytic Jacobian.

Test pyramid level 1 (SURVEY §4): analytic dq/dx vs jax.jacfwd of q(x);
charge conservation; oracle parity; minimum-image correctness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.charges import (
    charge_jacobian_values,
    effective_charges,
    jacobian_index_layout,
)
from chargeflux_tpu.models import water_box, water_cluster

from helpers import force_to_params
from oracle import compute_charges


def dense_jacobian(positions, system):
    """Scatter the analytic COO Jacobian into a dense [N, N, 3] array."""
    dq_idx, dx_idx = jacobian_index_layout(system)
    vals = charge_jacobian_values(positions, system)
    n = system.n_atoms
    out = np.zeros((n, n, 3))
    np.add.at(out, (np.asarray(dq_idx), np.asarray(dx_idx)), np.asarray(vals))
    return out


@pytest.mark.parametrize("flux", ["bond_angle", "water"])
def test_charges_match_oracle_cluster(flux):
    force, positions, _ = water_cluster(n_side=2, flux=flux, seed=3)
    system = force.create_system(dtype=jnp.float64)
    q = effective_charges(jnp.asarray(positions), system)
    q_ref, dqdx_ref = compute_charges(positions, force_to_params(force))
    np.testing.assert_allclose(np.asarray(q), q_ref, rtol=1e-13, atol=1e-14)
    np.testing.assert_allclose(dense_jacobian(jnp.asarray(positions), system),
                               dqdx_ref, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("flux", ["bond_angle", "water"])
def test_charges_match_oracle_pbc(flux):
    force, positions, _, box = water_box(n_side=2, flux=flux, seed=7)
    system = force.create_system(box=box, dtype=jnp.float64)
    q = effective_charges(jnp.asarray(positions), system)
    q_ref, dqdx_ref = compute_charges(positions, force_to_params(force),
                                      box=np.asarray(box))
    np.testing.assert_allclose(np.asarray(q), q_ref, rtol=1e-13, atol=1e-14)
    np.testing.assert_allclose(dense_jacobian(jnp.asarray(positions), system),
                               dqdx_ref, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("flux", ["bond_angle", "water"])
@pytest.mark.parametrize("pbc", [False, True])
def test_analytic_jacobian_matches_autodiff(flux, pbc):
    """The strongest unit check: hand-derived dq/dx == jax.jacfwd(q)."""
    if pbc:
        force, positions, _, box = water_box(n_side=2, flux=flux, seed=11)
        system = force.create_system(box=box, dtype=jnp.float64)
    else:
        force, positions, _ = water_cluster(n_side=2, flux=flux, seed=11)
        system = force.create_system(dtype=jnp.float64)
    x = jnp.asarray(positions)
    auto = jax.jacfwd(effective_charges)(x, system)   # [N, N, 3]
    np.testing.assert_allclose(dense_jacobian(x, system), np.asarray(auto),
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("flux", ["bond_angle", "water"])
def test_total_charge_conserved(flux):
    force, positions, _ = water_cluster(n_side=3, flux=flux, seed=5)
    system = force.create_system(dtype=jnp.float64)
    # perturb geometry strongly; total charge must stay at sum(q0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(positions + 0.05 * rng.standard_normal(positions.shape))
    q = effective_charges(x, system)
    np.testing.assert_allclose(float(jnp.sum(q)), float(jnp.sum(system.q0)),
                               atol=1e-12)


def test_minimum_image_bond():
    """A flux bond across the periodic boundary must use the min-image r."""
    force = cf.CoulForce()
    force.setUsesPeriodicBoundaryConditions(True)
    force.addParticle(-0.5, 0.3, 0.5)
    force.addParticle(0.5, 0.3, 0.5)
    force.addFluxBond(0, 1, 2.0, 0.1)
    box = np.array([2.0, 2.0, 2.0])
    system = force.create_system(box=box, dtype=jnp.float64)
    # atoms at x=0.05 and x=1.95: min-image distance 0.1 => dq = 0
    x = jnp.asarray([[0.05, 0.0, 0.0], [1.95, 0.0, 0.0]])
    q = effective_charges(x, system)
    np.testing.assert_allclose(np.asarray(q), [-0.5, 0.5], atol=1e-12)
