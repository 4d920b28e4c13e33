"""General heterogeneous on-ramp (models.onramp.system_from_pdb):
residue-table instantiation parity vs hand-built flat builder calls,
backbone link semantics, template+remainder split on real file input."""

import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.models import ResidueParams, system_from_pdb
from chargeflux_tpu.models.water import (ANGLE_HOH, EPS_H, EPS_O, K_ANGLE,
                                         K_BOND, Q_H, Q_O, R_OH, SIG_H,
                                         SIG_O)
from chargeflux_tpu.system import CoulForce
from chargeflux_tpu.utils.trajectory import write_pdb

# a 3-atom "residue" backbone (N, CA, C) — enough structure for intra
# terms, links and exclusions without a real force field
GLY = ResidueParams(
    atoms={"N": (0.25, 0.21, 0.2, 14.007),
           "CA": (-0.1, 0.23, 0.15, 12.011),
           "C": (-0.15, 0.22, 0.12, 12.011)},
    flux_bonds=[("N", "CA", 0.35, 0.146), ("CA", "C", 0.3, 0.152)],
    exclusions=[("N", "CA"), ("CA", "C"), ("N", "C")],
    bonds=[("N", "CA", 60000.0, 0.146), ("CA", "C", 60000.0, 0.152)],
    angles=[("N", "CA", "C", 300.0, 1.94)],
    link_exclusions=[("-C", "N"), ("-CA", "N")],
    link_flux_bonds=[("-C", "N", 0.4, 0.133)],
    link_bonds=[("-C", "N", 70000.0, 0.133)],
    link_angles=[("-CA", "-C", "N", 280.0, 2.03)],
)
HOH = ResidueParams(
    atoms={"O": (Q_O, SIG_O, EPS_O, 15.999),
           "H1": (Q_H, SIG_H, EPS_H, 1.008),
           "H2": (Q_H, SIG_H, EPS_H, 1.008)},
    flux_bonds=[("O", "H1", K_BOND, R_OH), ("O", "H2", K_BOND, R_OH)],
    flux_angles=[("H1", "O", "H2", K_ANGLE, ANGLE_HOH)],
    exclusions=[("O", "H1"), ("O", "H2"), ("H1", "H2")],
)
PARAMS = {"GLY": GLY, "HOH": HOH}


def _peptide_water_pdb(path, n_res=3, n_side=3, seed=7):
    """Synthetic peptide+water box: n_res 3-atom backbone residues along
    x, waters on the remaining lattice sites."""
    rng = np.random.default_rng(seed)
    spacing = 0.31
    box = np.full(3, n_side * spacing)
    pos, names, resnames, resseq = [], [], [], []
    # chain along x at the box center, ~0.14 nm spaced backbone atoms
    for r in range(n_res):
        for j, nm in enumerate(("N", "CA", "C")):
            pos.append([0.12 + 0.14 * (3 * r + j), box[1] / 2,
                        box[2] / 2])
            names.append(nm)
            resnames.append("GLY")
            resseq.append(r + 1)
    from chargeflux_tpu.models.water import _one_water
    k = 0
    for ix in range(n_side):
        for iy in range(n_side):
            for iz in range(n_side):
                if iy == 1 and iz == 1:
                    continue   # chain row
                c = spacing * (np.array([ix, iy, iz]) + 0.5)
                for row in _one_water(c, rng):
                    pos.append(row)
                names.extend(["O", "H1", "H2"])
                resnames.extend(["HOH"] * 3)
                resseq.extend([n_res + 1 + k] * 3)
                k += 1
    pos = np.asarray(pos)
    write_pdb(path, pos, box=box, names=names, resnames=resnames,
              resseq=resseq,
              symbols=[nm[0] for nm in names])
    return pos, box, n_res, k


def _hand_built(n_res, n_w):
    """The flat builder calls a reference user would write by hand, in
    the same file order the on-ramp emits."""
    force = CoulForce()
    force.setUsesPeriodicBoundaryConditions(True)
    force.setCutoffDistance(0.45)
    force.setEwaldErrorTolerance(1e-4)
    prev_c = prev_ca = None
    for r in range(n_res):
        ni = force.addParticle(0.25, 0.21, 0.2)
        ca = force.addParticle(-0.1, 0.23, 0.15)
        c = force.addParticle(-0.15, 0.22, 0.12)
        force.addException(ni, ca)
        force.addException(ca, c)
        force.addException(ni, c)
        force.addFluxBond(ni, ca, 0.35, 0.146)
        force.addFluxBond(ca, c, 0.3, 0.152)
        if prev_c is not None:
            force.addException(prev_c, ni)
            force.addException(prev_ca, ni)
            force.addFluxBond(prev_c, ni, 0.4, 0.133)
        prev_c, prev_ca = c, ca
    for w in range(n_w):
        o = force.addParticle(Q_O, SIG_O, EPS_O)
        h1 = force.addParticle(Q_H, SIG_H, EPS_H)
        h2 = force.addParticle(Q_H, SIG_H, EPS_H)
        force.addException(o, h1)
        force.addException(o, h2)
        force.addException(h1, h2)
        force.addFluxBond(o, h1, K_BOND, R_OH)
        force.addFluxBond(o, h2, K_BOND, R_OH)
        force.addFluxAngle(h1, o, h2, K_ANGLE, ANGLE_HOH)
    return force


def test_onramp_matches_hand_built(tmp_path):
    path = tmp_path / "pep.pdb"
    pos0, box0, n_res, n_w = _peptide_water_pdb(path)
    force, pos, masses, box, bonded_kw = system_from_pdb(
        str(path), PARAMS, cutoff=0.45)
    np.testing.assert_allclose(pos, pos0, atol=2e-4)   # PDB 1e-3 A grid
    np.testing.assert_allclose(box, box0, atol=1e-3)
    ref = _hand_built(n_res, n_w)
    assert force.getNumParticles() == ref.getNumParticles()
    assert force.getNumExceptions() == ref.getNumExceptions()
    assert force.getNumFluxBonds() == ref.getNumFluxBonds()
    assert force.getNumFluxAngles() == ref.getNumFluxAngles()

    x = jnp.asarray(pos, jnp.float64)
    sys_a = force.create_system(box=box, dtype=jnp.float64)
    sys_b = ref.create_system(box=box, dtype=jnp.float64)
    ea, fa = cf.energy_and_forces(x, sys_a)
    eb, fb = cf.energy_and_forces(x, sys_b)
    assert float(ea) == pytest.approx(float(eb), rel=1e-13)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=1e-12, atol=1e-12)

    # the repeated waters must land on the template fast path with the
    # linked chain as scatter remainder (heterogeneous contract)
    ts = sys_a.spec.flux_template
    assert ts is not None
    assert any(t.count == n_w for t in ts.templates)
    assert any(c for _, c in ts.remainder)

    # masses and harmonic terms assembled per table
    assert masses[0] == pytest.approx(14.007)
    assert masses[3 * n_res] == pytest.approx(15.999)
    # 2 intra bonds/res + (n_res-1) links; 1 intra angle/res + (n_res-1)
    assert len(bonded_kw["bond_idx"]) == 2 * n_res + (n_res - 1)
    assert len(bonded_kw["angle_idx"]) == n_res + (n_res - 1)


def test_onramp_chain_break_skips_links(tmp_path):
    """A resseq gap between consecutive GLY runs must suppress the
    backbone link (no exception/flux bond across the break)."""
    path = tmp_path / "two_chains.pdb"
    pos, names, resnames, resseq = [], [], [], []
    for r, seq in enumerate((1, 2, 7, 8)):     # break between 2 and 7
        for j, nm in enumerate(("N", "CA", "C")):
            pos.append([0.3 + 0.14 * (3 * r + j), 1.0, 1.0])
            names.append(nm)
            resnames.append("GLY")
            resseq.append(seq)
    write_pdb(path, np.asarray(pos), box=np.full(3, 4.0), names=names,
              resnames=resnames, resseq=resseq,
              symbols=[nm[0] for nm in names])
    force, *_ = system_from_pdb(str(path), PARAMS, cutoff=0.45)
    # links fire inside (1,2) and (7,8) but not across (2,7):
    # exceptions = 4*3 intra + 2*2 links; flux bonds = 4*2 intra + 2 links
    assert force.getNumExceptions() == 12 + 4
    assert force.getNumFluxBonds() == 8 + 2


def test_onramp_loud_failures(tmp_path):
    path = tmp_path / "bad.pdb"
    write_pdb(path, np.zeros((3, 3)), box=np.full(3, 2.0),
              names=["O", "H1", "H2"], resnames=["XXX"] * 3,
              resseq=[1] * 3, symbols=["O", "H", "H"])
    with pytest.raises(KeyError, match="XXX"):
        system_from_pdb(str(path), PARAMS)
    write_pdb(path, np.zeros((2, 3)), box=np.full(3, 2.0),
              names=["O", "H1"], resnames=["HOH"] * 2,
              resseq=[1] * 2, symbols=["O", "H"])
    with pytest.raises(ValueError, match="missing"):
        system_from_pdb(str(path), PARAMS)


def test_onramp_flux_water_terms(tmp_path):
    """The addFluxWater route through the residue table: a water-box PDB
    with flux_waters rows must match models.water's 'water' flux mode."""
    from chargeflux_tpu.models.water import (K1_WATER, K2_WATER, KUB_WATER,
                                             R_HH, _one_water)

    rng = np.random.default_rng(3)
    spacing = 0.31
    n_side = 3
    box = np.full(3, n_side * spacing)
    pos, names, resnames, resseq = [], [], [], []
    k = 0
    for ix in range(n_side):
        for iy in range(n_side):
            for iz in range(n_side):
                c = spacing * (np.array([ix, iy, iz]) + 0.5)
                pos.extend(_one_water(c, rng))
                names.extend(["O", "H1", "H2"])
                resnames.extend(["HOH"] * 3)
                resseq.extend([k + 1] * 3)
                k += 1
    path = tmp_path / "wat.pdb"
    write_pdb(path, np.asarray(pos), box=box, names=names,
              resnames=resnames, resseq=resseq,
              symbols=[nm[0] for nm in names])

    hoh_w = ResidueParams(
        atoms=HOH.atoms,
        flux_waters=[("O", "H1", "H2", K1_WATER, K2_WATER, KUB_WATER,
                      R_OH, R_HH)],
        exclusions=HOH.exclusions)
    force, pos_r, _m, box_r, _bk = system_from_pdb(
        str(path), {"HOH": hoh_w}, cutoff=0.45)
    assert force.getNumFluxWaters() == k

    ref = CoulForce()
    ref.setUsesPeriodicBoundaryConditions(True)
    ref.setCutoffDistance(0.45)
    ref.setEwaldErrorTolerance(1e-4)
    for w in range(k):
        o = ref.addParticle(Q_O, SIG_O, EPS_O)
        h1 = ref.addParticle(Q_H, SIG_H, EPS_H)
        h2 = ref.addParticle(Q_H, SIG_H, EPS_H)
        ref.addException(o, h1)
        ref.addException(o, h2)
        ref.addException(h1, h2)
        ref.addFluxWater(o, h1, h2, K1_WATER, K2_WATER, KUB_WATER,
                         R_OH, R_HH)
    x = jnp.asarray(pos_r, jnp.float64)
    ea, fa = cf.energy_and_forces(x, force.create_system(
        box=box_r, dtype=jnp.float64))
    eb, fb = cf.energy_and_forces(x, ref.create_system(
        box=box_r, dtype=jnp.float64))
    assert float(ea) == pytest.approx(float(eb), rel=1e-13)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=1e-12, atol=1e-12)


def test_onramp_triclinic_cryst1(tmp_path):
    """A triclinic CRYST1 cell must flow through system_from_pdb as the
    reduced [3, 3] lattice and produce the same energetics as building
    the system on the lattice directly."""
    from chargeflux_tpu.models.water import _one_water

    rng = np.random.default_rng(5)
    L = 3 * 0.31
    B = np.array([[L, 0.0, 0.0],
                  [0.12 * L, L, 0.0],
                  [0.05 * L, -0.08 * L, L]])
    pos, names, resnames, resseq = [], [], [], []
    k = 0
    for ix in range(3):
        for iy in range(3):
            for iz in range(3):
                f = (np.array([ix, iy, iz]) + 0.5) / 3.0
                pos.extend(_one_water(f @ B, rng))
                names.extend(["O", "H1", "H2"])
                resnames.extend(["HOH"] * 3)
                resseq.extend([k + 1] * 3)
                k += 1
    path = tmp_path / "tri.pdb"
    write_pdb(path, np.asarray(pos), box=B, names=names,
              resnames=resnames, resseq=resseq,
              symbols=[nm[0] for nm in names])
    force, pos_r, _m, box_r, _bk = system_from_pdb(
        str(path), PARAMS, cutoff=0.4)
    assert np.asarray(box_r).shape == (3, 3)
    np.testing.assert_allclose(box_r, B, atol=2e-3)   # CRYST1 rounding
    x = jnp.asarray(pos_r, jnp.float64)
    ea, fa = cf.energy_and_forces(
        x, force.create_system(box=box_r, dtype=jnp.float64))
    # same force table on the exact lattice: CRYST1 carries lengths to
    # 1e-3 A and angles to 0.01 deg, which perturbs the lattice (and the
    # derived alpha/kmax) at the ~1e-3 level — measured 4e-4 rel energy
    eb, fb = cf.energy_and_forces(
        x, force.create_system(box=B, dtype=jnp.float64))
    assert float(ea) == pytest.approx(float(eb), rel=2e-3)
    assert np.all(np.isfinite(np.asarray(fa)))
