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
