"""Ewald consistency: for an isolated neutral cluster in a huge box with a
cutoff covering the whole cluster, the periodic Ewald total (self +
reciprocal + direct + exclusion correction) must converge to the
non-periodic all-pairs Coulomb+LJ energy (SURVEY §4 property 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.models import water_cluster


def test_ewald_converges_to_direct_sum():
    force, pos, _ = water_cluster(n_side=2, flux="bond_angle", seed=91)
    system_free = force.create_system(dtype=jnp.float64)
    x = jnp.asarray(pos)
    e_free = float(cf.energy(x, system_free))

    # same topology, periodic, box much larger than the cluster
    force.setUsesPeriodicBoundaryConditions(True)
    force.setCutoffDistance(2.8)
    force.setEwaldErrorTolerance(1e-7)
    box = np.array([7.0, 7.0, 7.0])
    system_pbc = force.create_system(box=box, dtype=jnp.float64)
    x_shift = x + jnp.asarray([3.0, 3.0, 3.0])  # center in the box
    e_pbc = float(cf.energy(x_shift, system_pbc))

    # periodic images are ~6 nm away; residual image interaction is tiny
    assert e_pbc == pytest.approx(e_free, abs=0.05)


def test_forces_converge_too():
    force, pos, _ = water_cluster(n_side=2, flux="water", seed=92)
    system_free = force.create_system(dtype=jnp.float64)
    x = jnp.asarray(pos)
    f_free = np.asarray(cf.forces(x, system_free))

    force.setUsesPeriodicBoundaryConditions(True)
    force.setCutoffDistance(2.8)
    force.setEwaldErrorTolerance(1e-7)
    box = np.array([7.0, 7.0, 7.0])
    system_pbc = force.create_system(box=box, dtype=jnp.float64)
    f_pbc = np.asarray(cf.forces(x + jnp.asarray([3.0, 3.0, 3.0]), system_pbc))
    scale = np.abs(f_free).max()
    np.testing.assert_allclose(f_pbc / scale, f_free / scale, atol=5e-4)
