"""Molecule-template detection and the gather/scatter-free fast paths.

The template paths (charges._template_effective_charges,
energy._template_exclusion_correction) must be bit-compatible with the
general scatter paths; detection must decline anything that doesn't repeat.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chargeflux_tpu.charges import effective_charges
from chargeflux_tpu.energy import _energy, _exclusion_correction
from chargeflux_tpu.models import water_box
from chargeflux_tpu.system import CoulForce
from chargeflux_tpu.topology import detect_template


def _without_templates(system):
    spec = dataclasses.replace(system.spec, flux_template=None,
                               excl_template=None)
    return dataclasses.replace(system, spec=spec)


@pytest.mark.parametrize("flux", ["bond_angle", "water"])
def test_template_matches_scatter_path(flux):
    force, pos, _, box = water_box(n_side=3, flux=flux, seed=17)
    system = force.create_system(box=box, dtype=jnp.float64)
    assert system.spec.flux_template is not None
    assert system.spec.excl_template is not None
    x = jnp.asarray(pos)
    plain = _without_templates(system)

    q_t = effective_charges(x, system)
    q_s = effective_charges(x, plain)
    np.testing.assert_allclose(np.asarray(q_t), np.asarray(q_s),
                               rtol=1e-14, atol=1e-15)

    for sub in (False, True):
        e_t = _exclusion_correction(x, q_t, system, subtract_direct=sub)
        e_s = _exclusion_correction(x, q_s, plain, subtract_direct=sub)
        np.testing.assert_allclose(float(e_t), float(e_s), rtol=1e-12)

    e1, g1 = jax.value_and_grad(_energy)(x, system)
    e2, g2 = jax.value_and_grad(_energy)(x, plain)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-10, atol=1e-12)


def test_template_detected_for_water_box():
    force, _, _, box = water_box(n_side=2, flux="bond_angle", seed=3)
    system = force.create_system(box=box)
    ts = system.spec.flux_template
    assert ts is not None and len(ts.templates) == 1
    assert all(c == 0 for _, c in ts.remainder)
    tpl = ts.templates[0]
    assert (tpl.offset, tpl.stride, tpl.count) == (0, 3, 8)
    assert tpl.local_rows("bonds") == ((0, 1), (0, 2))
    assert tpl.local_rows("angles") == ((1, 0, 2),)
    etpl = system.spec.excl_template.templates[0]
    assert etpl.local_rows("exclusions") == ((0, 1), (0, 2), (1, 2))


def test_cross_molecule_terms_merge_components():
    # a bond linking two blocks merges them into one bigger molecule
    det = detect_template({"bonds": np.array([[0, 1], [3, 4], [1, 3]])})
    assert det is not None
    tpl, _ = det
    assert tpl.count == 1 and tpl.stride == 5
    assert tpl.local_rows("bonds") == ((0, 1), (1, 3), (3, 4))


def test_detection_declines_heterogeneous_counts():
    det = detect_template({"bonds": np.array([[0, 1], [0, 2], [3, 4]])})
    assert det is None


def test_detection_declines_oversized_molecules():
    # a single molecule wider than the stride limit
    det = detect_template({"bonds": np.array([[0, 1], [0, 500]])})
    assert det is None


def test_detection_handles_offset_and_param_variation():
    """Template atoms needn't start at 0, and parameters may vary by copy."""
    force = CoulForce()
    force.setUsesPeriodicBoundaryConditions(True)
    force.setCutoffDistance(0.3)
    # one lone ion before the repeating diatomics
    force.addParticle(1.0, 0.3, 0.5)
    rng = np.random.default_rng(5)
    for m in range(4):
        a = force.addParticle(-0.5, 0.3, 0.4)
        b = force.addParticle(0.5, 0.25, 0.3)
        force.addFluxBond(a, b, 1.0 + 0.1 * m, 0.1)
        force.addException(a, b)
    box = np.array([2.0, 2.0, 2.0])
    system = force.create_system(box=box, dtype=jnp.float64)
    ts = system.spec.flux_template
    assert ts is not None and len(ts.templates) == 1
    tpl = ts.templates[0]
    assert tpl.offset == 1 and tpl.stride == 2 and tpl.count == 4
    pos = jnp.asarray(rng.uniform(0, 2.0, (9, 3)))
    q_t = effective_charges(pos, system)
    q_s = effective_charges(pos, _without_templates(system))
    np.testing.assert_allclose(np.asarray(q_t), np.asarray(q_s),
                               rtol=1e-14, atol=1e-15)
    # per-copy k variation must land on the right copies
    assert not np.allclose(np.asarray(q_t[1:]).reshape(4, 2),
                           np.asarray(q_t[1:]).reshape(4, 2)[::-1])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_multi_template_random_mixtures_match_scatter(seed):
    """Property test: random mixtures of repeated molecule species +
    irregular solutes.  Whatever detect_templates carves into templates
    vs remainder, q(x) must equal the pure scatter path bitwise-ish."""
    rng = np.random.default_rng(seed)
    force = CoulForce()
    force.setUsesPeriodicBoundaryConditions(True)
    force.setCutoffDistance(0.4)

    def add_diatomic():
        a = force.addParticle(-0.3, 0.3, 0.4)
        b = force.addParticle(0.3, 0.25, 0.3)
        force.addFluxBond(a, b, float(rng.uniform(0.5, 2.0)), 0.12)
        force.addException(a, b)

    def add_triatomic():
        ids = [force.addParticle(q, 0.3, 0.2)
               for q in (-0.5, 0.25, 0.25)]
        force.addFluxBond(ids[0], ids[1], 1.0, 0.1)
        force.addFluxBond(ids[0], ids[2], 1.0, 0.1)
        force.addFluxAngle(ids[1], ids[0], ids[2], 0.1, 1.8)
        force.addException(ids[0], ids[1])
        force.addException(ids[0], ids[2])

    def add_chain(n):
        ids = [force.addParticle(0.2 if i % 2 == 0 else -0.2, 0.2, 0.1)
               for i in range(n)]
        for i in range(n - 1):
            force.addFluxBond(ids[i], ids[i + 1],
                              float(rng.uniform(0.2, 0.6)), 0.15)
            force.addException(ids[i], ids[i + 1])

    def add_ion():
        force.addParticle(float(rng.choice([-1.0, 1.0])), 0.3, 0.3)

    makers = [add_diatomic, add_triatomic, lambda: add_chain(5), add_ion]
    # random segments: runs of one species of random length
    for _ in range(rng.integers(3, 7)):
        make = makers[rng.integers(0, len(makers))]
        for _ in range(rng.integers(1, 9)):
            make()
    n = force.getNumParticles()
    if abs(sum(force.getParticleParameters(i)[0] for i in range(n))) > 1e-9:
        force.addParticle(-sum(force.getParticleParameters(i)[0]
                               for i in range(n)), 0.3, 0.3)
        n += 1
    box = np.full(3, 4.0)
    system = force.create_system(box=box, dtype=jnp.float64)
    pos = jnp.asarray(rng.uniform(0, 4.0, (n, 3)))
    q_t = effective_charges(pos, system)
    q_s = effective_charges(pos, _without_templates(system))
    np.testing.assert_allclose(np.asarray(q_t), np.asarray(q_s),
                               rtol=1e-14, atol=1e-15)
    for sub in (False, True):
        e_t = _exclusion_correction(pos, q_t, system, subtract_direct=sub)
        e_s = _exclusion_correction(pos, q_s, _without_templates(system),
                                    subtract_direct=sub)
        np.testing.assert_allclose(float(e_t), float(e_s), rtol=1e-12)
    g_t = jax.grad(_energy)(pos, system)
    g_s = jax.grad(_energy)(pos, _without_templates(system))
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_s),
                               rtol=1e-9, atol=1e-11)
