"""Oracle parity and sanity for the ionic-solution model family
(chargeflux_tpu.models.salt): Na+/Cl- in flexible charge-flux water.

Unlike test_heterogeneous (which hand-assembles an ion/water mix to stress
topology detection), this covers the *public builder*: charge neutrality,
template detection with a trailing ion block, and f64 oracle parity on
both direct routes."""

import numpy as np

import jax.numpy as jnp

import helpers
import oracle
from chargeflux_tpu import energy_and_forces, forces_manual
from chargeflux_tpu.models import salt_water_box


def _system(direct_method):
    force, pos, _, box = salt_water_box(n_side=6, n_ion_pairs=3, cutoff=0.55)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method=direct_method)
    return force, np.asarray(pos), np.asarray(box), system


def test_salt_box_is_neutral_and_template_detected():
    force, pos, box, system = _system("cell")
    params = helpers.force_to_params(force)
    assert abs(float(np.sum(params["q0"]))) < 1e-12
    assert len(pos) == 3 * (6 ** 3 - 6) + 6
    # waters are a contiguous prefix: template detection must succeed
    assert system.spec.excl_template is not None
    assert system.spec.excl_template.templates[0].offset == 0


def test_salt_oracle_parity():
    force, pos, box, system = _system("cell")
    e, f = energy_and_forces(jnp.asarray(pos, jnp.float64), system)
    eo, fo, _ = oracle.energy_forces_pbc(pos, helpers.force_to_params(force),
                                         box, 0.55, 1e-4)
    assert abs(float(e) - eo) / abs(eo) < 1e-10
    assert np.max(np.abs(np.asarray(f) - fo)) < 1e-9
    f_man = forces_manual(jnp.asarray(pos, jnp.float64), system)
    assert np.max(np.abs(np.asarray(f_man) - fo)) < 1e-9


def test_salt_dense_matches_cell():
    _force, pos, _box, sys_cell = _system("cell")
    _f2, _p2, _b2, sys_dense = _system("dense")
    x = jnp.asarray(pos, jnp.float64)
    e_c, f_c = energy_and_forces(x, sys_cell)
    e_d, f_d = energy_and_forces(x, sys_dense)
    assert abs(float(e_c) - float(e_d)) / abs(float(e_d)) < 1e-10
    assert np.max(np.abs(np.asarray(f_c) - np.asarray(f_d))) < 1e-9
