"""Periodic torsion term (OpenMM PeriodicTorsionForce convention).

The dihedral is pinned against an independent NumPy reference (the
praxeolitic atan2 formulation), signs included; forces come from autodiff
and are checked for Newton's third law and translation invariance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chargeflux_tpu.bonded import (BondedParams, bonded_energy,
                                   periodic_torsion_energy)


def ref_dihedral(p0, p1, p2, p3):
    """Independent NumPy dihedral (praxeolitic formulation), IUPAC sign."""
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1 /= np.linalg.norm(b1)
    v = b0 - np.dot(b0, b1) * b1
    w = b2 - np.dot(b2, b1) * b1
    x = np.dot(v, w)
    y = np.dot(np.cross(b1, v), w)
    return np.arctan2(y, x)


def _geometry(phi):
    """4-atom chain with dihedral exactly phi about the z-axis bond."""
    return np.array([
        [1.0, 0.0, -0.3],
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0],
        [np.cos(phi), np.sin(phi), 1.3],
    ])


@pytest.mark.parametrize("phi", [-2.5, -0.9, 0.0, 0.7, 2.9])
@pytest.mark.parametrize("n,phi0", [(1, 0.0), (2, 0.5), (3, -1.2)])
def test_torsion_energy_matches_reference(phi, n, phi0):
    pos = _geometry(phi)
    phi_ref = ref_dihedral(*pos)
    k = 7.3
    e = float(periodic_torsion_energy(
        jnp.asarray(pos), jnp.asarray([[0, 1, 2, 3]]),
        jnp.asarray([k]), jnp.asarray([float(n)]), jnp.asarray([phi0]),
        jnp.ones(3), pbc=False))
    e_ref = k * (1.0 + np.cos(n * phi_ref - phi0))
    assert abs(e - e_ref) <= 1e-12 * max(abs(e_ref), 1.0)
    # the constructed geometry has dihedral exactly phi
    assert abs(((phi_ref - phi + np.pi) % (2 * np.pi)) - np.pi) < 1e-12


def test_torsion_forces_sane():
    pos = jnp.asarray(_geometry(0.8) + 0.05)
    bonded = BondedParams.create(
        bond_idx=np.zeros((0, 2)), bond_k=[], bond_r0=[],
        angle_idx=np.zeros((0, 3)), angle_k=[], angle_theta0=[],
        box=np.ones(3) * 10, pbc=True,
        torsion_idx=[[0, 1, 2, 3]], torsion_k=[3.1], torsion_n=[2],
        torsion_phi0=[0.4], dtype=jnp.float64)
    g = jax.grad(bonded_energy)(pos, bonded)
    # Newton's third law
    assert float(jnp.max(jnp.abs(jnp.sum(g, axis=0)))) < 1e-12
    # translation invariance of the energy
    e0 = float(bonded_energy(pos, bonded))
    e1 = float(bonded_energy(pos + jnp.asarray([0.3, -0.2, 0.1]), bonded))
    assert abs(e0 - e1) < 1e-12
    # finite-difference check of one component
    h = 1e-6
    dp = jnp.zeros_like(pos).at[3, 1].set(h)
    fd = (float(bonded_energy(pos + dp, bonded))
          - float(bonded_energy(pos - dp, bonded))) / (2 * h)
    assert abs(fd - float(g[3, 1])) < 1e-7


def test_torsion_composes_with_harmonic_terms():
    """Torsions add on top of the template bond/angle path (the early
    template return must not skip them)."""
    from chargeflux_tpu.models import water_bonded_params
    import dataclasses
    bonded = water_bonded_params(4, box=np.ones(3) * 5, dtype=jnp.float64)
    assert bonded.template is not None
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 5, (12, 3)))
    e_plain = float(bonded_energy(pos, bonded))
    with_tor = dataclasses.replace(
        bonded, torsion_idx=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        torsion_k=jnp.asarray([2.0]), torsion_n=jnp.asarray([1.0]),
        torsion_phi0=jnp.asarray([0.0]))
    e_tor = float(bonded_energy(pos, with_tor))
    e_only = float(periodic_torsion_energy(
        pos, with_tor.torsion_idx, with_tor.torsion_k, with_tor.torsion_n,
        with_tor.torsion_phi0, with_tor.box, with_tor.pbc))
    assert abs(e_tor - (e_plain + e_only)) < 1e-12


def test_torsion_pbc_straddle():
    """A chain straddling the periodic boundary scores the same dihedral
    energy as its unwrapped image (min-image displacements)."""
    pos = _geometry(1.1)
    box = np.array([3.0, 3.0, 3.0])
    args = (jnp.asarray([[0, 1, 2, 3]]), jnp.asarray([4.2]),
            jnp.asarray([3.0]), jnp.asarray([0.6]), jnp.asarray(box))
    e_plain = float(periodic_torsion_energy(jnp.asarray(pos + 1.0), *args,
                                            pbc=True))
    # shift two atoms by a full box: wrapped image of the same geometry
    wrapped = pos + 1.0
    wrapped[2:] += np.array([0.0, 0.0, 3.0])
    e_wrap = float(periodic_torsion_energy(jnp.asarray(wrapped), *args,
                                           pbc=True))
    assert abs(e_plain - e_wrap) < 1e-12
