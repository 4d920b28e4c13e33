"""Property tests for forces (SURVEY §4 level 2).

- total force == -grad E via central finite differences
- manual dedq/dqdx chain-rule path == full autodiff (the whole-system
  consistency check with no equivalent in the reference)
- Newton's third law: sum of forces == 0 (noPBC), and also under PBC since
  every term depends on coordinate differences only
- energy invariance under rigid translation (PBC: box translation)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.models import water_box, water_cluster


def _systems(flux="bond_angle"):
    force, pos, _ = water_cluster(n_side=2, flux=flux, seed=21)
    yield force.create_system(dtype=jnp.float64), jnp.asarray(pos), "nopbc"
    force, pos, _, box = water_box(n_side=2, flux=flux, seed=22)
    yield force.create_system(box=box, dtype=jnp.float64), jnp.asarray(pos), "pbc"


@pytest.mark.parametrize("flux", ["bond_angle", "water"])
def test_forces_match_finite_differences(flux):
    for system, x, tag in _systems(flux):
        f = np.asarray(cf.forces(x, system))
        rng = np.random.default_rng(1)
        h = 2e-6
        for _ in range(6):
            i = rng.integers(0, x.shape[0])
            d = rng.integers(0, 3)
            dx = np.zeros(x.shape)
            dx[i, d] = h
            ep = float(cf.energy(x + dx, system))
            em = float(cf.energy(x - dx, system))
            fd = -(ep - em) / (2 * h)
            assert f[i, d] == pytest.approx(fd, rel=2e-6, abs=2e-4), (tag, i, d)


@pytest.mark.parametrize("flux", ["bond_angle", "water", "none"])
def test_manual_dedq_path_equals_autodiff(flux):
    for system, x, tag in _systems(flux):
        f_auto = np.asarray(cf.forces(x, system))
        f_manual = np.asarray(cf.forces_manual(x, system))
        scale = np.abs(f_auto).max()
        np.testing.assert_allclose(f_manual / scale, f_auto / scale,
                                   atol=1e-12, err_msg=tag)


def test_newtons_third_law():
    for system, x, tag in _systems():
        f = np.asarray(cf.forces(x, system))
        np.testing.assert_allclose(f.sum(axis=0), np.zeros(3), atol=1e-9,
                                   err_msg=tag)


def test_translation_invariance():
    for system, x, tag in _systems():
        e0 = float(cf.energy(x, system))
        shift = jnp.asarray([0.123, -0.456, 0.789])
        e1 = float(cf.energy(x + shift, system))
        assert e1 == pytest.approx(e0, rel=1e-11), tag


def test_energy_only_vs_forces_energy_consistency():
    """value_and_grad energy must equal plain energy."""
    for system, x, tag in _systems():
        e0 = float(cf.energy(x, system))
        e1, _ = cf.energy_and_forces(x, system)
        assert float(e1) == pytest.approx(e0, rel=1e-14), tag
