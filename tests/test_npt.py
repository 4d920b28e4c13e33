"""NPT support: traced-box energies (system.with_box) and the MC barostat.

The reference plugin has no barostat — its users attach OpenMM's
MonteCarloBarostat (SURVEY §1 L0).  These tests pin the standalone
equivalent: (1) the energy under a *traced* scaled box matches the f64
oracle evaluated at that scaled geometry (the whole point of with_box is
that no recompval/recreation is needed); (2) molecule assignment from the
exclusion graph; (3) the NPT Langevin driver runs, conserves sanity, and
responds to pressure; (4) shrinking the box below the static cell grid's
validity poisons the energy instead of silently dropping pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.models import water_box, water_bonded_params
from chargeflux_tpu.npt import (instantaneous_pressure, molecule_index,
                                npt_langevin_trajectory)
from chargeflux_tpu.npt import BAR_TO_KJ_MOL_NM3
from chargeflux_tpu.units import BOLTZ

from helpers import force_to_params
from oracle import energy_forces_pbc, ewald_alpha_kmax


@pytest.mark.parametrize("scale", [0.995, 1.01])
def test_with_box_scaled_oracle_parity(scale):
    """E/F under with_box(s*box) at scaled coordinates == oracle at the
    scaled geometry, with the ORIGINAL box's trace-time statics."""
    force, positions, _, box = water_box(n_side=3, flux="bond_angle", seed=4)
    system = force.create_system(box=box, dtype=jnp.float64)
    # the statics (kmax) must be unchanged at this scale or the comparison
    # is apples-to-oranges; this guards the test's own premise
    _, kmax_scaled = ewald_alpha_kmax(force.getCutoffDistance(),
                                      force.getEwaldErrorTolerance(),
                                      np.asarray(box) * scale)
    assert tuple(kmax_scaled) == tuple(system.spec.kmax)

    x_s = jnp.asarray(positions) * scale
    sys_s = system.with_box(jnp.asarray(box) * scale)
    e = float(cf.energy(x_s, sys_s))
    f = np.asarray(cf.forces(x_s, sys_s))
    e_ref, f_ref, _ = energy_forces_pbc(
        np.asarray(positions) * scale, force_to_params(force),
        np.asarray(box) * scale, force.getCutoffDistance(),
        force.getEwaldErrorTolerance())
    assert abs(e - e_ref) <= 1e-10 * abs(e_ref)
    fs = np.abs(f_ref).max()
    np.testing.assert_allclose(f / fs, f_ref / fs, atol=1e-10)


def test_with_box_is_jit_stable():
    """One compiled function serves many boxes (box is a traced leaf)."""
    force, positions, _, box = water_box(n_side=3, seed=1)
    system = force.create_system(box=box, dtype=jnp.float64)
    x = jnp.asarray(positions)

    calls = 0

    @jax.jit
    def e_of(xx, sysb):
        nonlocal calls
        calls += 1
        return cf.energy(xx, sysb)

    vals = [float(e_of(x * s, system.with_box(system.box * s)))
            for s in (1.0, 1.002, 0.998)]
    assert calls == 1          # traced once; box moves don't retrace
    assert len({round(v, 6) for v in vals}) == 3


def test_molecule_index_waters():
    force, _, _, box = water_box(n_side=3, seed=0)
    system = force.create_system(box=box, dtype=jnp.float64)
    mol_id, first_idx, counts = molecule_index(system)
    n_w = system.n_atoms // 3
    assert first_idx.shape[0] == n_w
    assert np.all(counts == 3.0)
    # waters are contiguous atom triplets in the model builder
    assert np.array_equal(mol_id, np.repeat(np.arange(n_w), 3))


def _npt_setup(n_side, seed=0, **kw):
    force, positions, masses, box = water_box(n_side=n_side, seed=seed, **kw)
    system = force.create_system(box=box, dtype=jnp.float64)
    bonded = water_bonded_params(system.n_atoms // 3, box=box,
                                 dtype=jnp.float64)
    return system, jnp.asarray(positions), jnp.asarray(np.asarray(masses),
                                                       jnp.float64), bonded


def test_npt_langevin_dense_route():
    system, x, masses, bonded = _npt_setup(3)
    v = jnp.zeros_like(x)
    x1, v1, box1, diag = npt_langevin_trajectory(
        x, v, system, masses, dt=2e-4, temperature=300.0, friction=5.0,
        pressure_bar=1.0, key=jax.random.PRNGKey(7), n_steps=100,
        bonded=bonded, barostat_interval=20)
    assert np.all(np.isfinite(np.asarray(diag["energies"])))
    assert np.all(np.isfinite(np.asarray(x1)))
    assert diag["boxes"].shape == (5, 3)
    assert bool(np.any(np.asarray(diag["accepts"])))   # some moves accept
    # accepted moves actually changed the volume
    vols = np.prod(np.asarray(diag["boxes"]), axis=1)
    assert len(np.unique(np.round(vols, 12))) > 1


def test_npt_pressure_compresses():
    """A huge external pressure must shrink the box (ensemble direction)."""
    system, x, masses, bonded = _npt_setup(3)
    v = jnp.zeros_like(x)
    _, _, box1, diag = npt_langevin_trajectory(
        x, v, system, masses, dt=2e-4, temperature=300.0, friction=5.0,
        pressure_bar=2e4, key=jax.random.PRNGKey(3), n_steps=200,
        bonded=bonded, barostat_interval=20)
    v0 = float(np.prod(np.asarray(system.box)))
    v1 = float(np.prod(np.asarray(box1)))
    assert np.all(np.isfinite(np.asarray(diag["energies"])))
    assert v1 < v0


def test_cell_route_shrunk_box_poisons():
    """Cell-grid validity guard: a box below grid*cutoff NaNs the energy
    (the static grid can no longer see all in-cutoff pairs)."""
    force, positions, _, box = water_box(n_side=10, seed=2)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    x = jnp.asarray(positions)
    e_ok = float(cf.energy(x, system))
    assert np.isfinite(e_ok)
    s = 0.85    # edge/cutoff headroom is ~1.15 here; 0.85 breaks validity
    e_bad = float(cf.energy(x * s, system.with_box(system.box * s)))
    assert np.isnan(e_bad)
    f_bad = np.asarray(cf.forces(x * s, system.with_box(system.box * s)))
    assert np.all(np.isnan(f_bad))


def test_pressure_ideal_gas():
    """Zero interactions: P is exactly the kinetic term 2K/(3V)."""
    force = cf.CoulForce()
    force.setUsesPeriodicBoundaryConditions(True)
    force.setCutoffDistance(0.9)
    for _ in range(8):
        force.addParticle(0.0, 0.3, 0.0)
    box = np.array([4.0, 4.0, 4.0])
    system = force.create_system(box=box, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 4, (8, 3)))
    v = jnp.asarray(rng.standard_normal((8, 3)))
    m = jnp.ones(8, jnp.float64) * 18.0
    p = float(instantaneous_pressure(x, v, system, m))
    ke = 0.5 * float(jnp.sum(m[:, None] * v * v))
    p_ref = 2.0 * ke / (3.0 * 64.0) / BAR_TO_KJ_MOL_NM3
    assert abs(p - p_ref) <= 1e-10 * abs(p_ref)


def test_pressure_lj_pair_analytic():
    """Two LJ atoms: the virial is -r u'(r), checked against closed form."""
    force = cf.CoulForce()
    force.setUsesPeriodicBoundaryConditions(True)
    force.setCutoffDistance(0.9)
    sig, eps = 0.31, 0.65
    force.addParticle(0.0, sig, eps)
    force.addParticle(0.0, sig, eps)
    box = np.array([4.0, 4.0, 4.0])
    system = force.create_system(box=box, dtype=jnp.float64)
    r = 0.33
    x = jnp.asarray([[1.0, 1.0, 1.0], [1.0 + r, 1.0, 1.0]])
    v = jnp.zeros((2, 3), jnp.float64)
    m = jnp.ones(2, jnp.float64)
    p = float(instantaneous_pressure(x, v, system, m))
    sr6 = (sig / r) ** 6
    du_dr = 4.0 * eps * (-12.0 * sr6 * sr6 + 6.0 * sr6) / r
    p_ref = -(r * du_dr) / (3.0 * 64.0) / BAR_TO_KJ_MOL_NM3
    assert abs(p - p_ref) <= 1e-10 * abs(p_ref)


def test_pressure_coulomb_homogeneity():
    """Pure Coulomb (rigid charges, no LJ) is homogeneous of degree -1 in
    the scaled geometry, so dE/ds|1 = -E: the Ewald virial must satisfy
    P = (2K + E)/(3V) to the Ewald tolerance, self/direct/reciprocal split
    notwithstanding (the split shifts with fixed alpha; the total scales).
    Needs cutoff <= box/2: on smaller boxes the nearest-image-only direct
    sum truncates beyond-image pairs and breaks covariance.  The virial
    amplifies Ewald *truncation* error ~100x vs the energy (the missing
    tails' s-derivative carries the (pi kmax/(L alpha))^2 exponent factor)
    — measured rel err 9e-2 / 7e-4 / 6e-6 at tol 1e-4 / 1e-6 / 1e-8 —
    so this pins at tol 1e-6."""
    force, positions, _, box = water_box(n_side=6, flux="none", seed=5,
                                         ewald_tol=1e-6)
    for i in range(force.getNumParticles()):
        q, sig, _ = force.getParticleParameters(i)
        force.setParticleParameters(i, q, sig, 0.0)
    system = force.create_system(box=box, dtype=jnp.float64)
    x = jnp.asarray(positions)
    v = jnp.zeros_like(x)
    m = jnp.ones(x.shape[0], jnp.float64)
    e = float(cf.energy(x, system))
    vol = float(np.prod(box))
    p = float(instantaneous_pressure(x, v, system, m))
    p_ref = e / (3.0 * vol) / BAR_TO_KJ_MOL_NM3    # 2K = 0
    assert abs(p - p_ref) <= 5e-3 * abs(p_ref)


def test_pressure_cell_matches_dense():
    """The cell route's virial (plain-autodiff roll walk + classical
    recip) equals the dense route's on the same configuration."""
    force, positions, _, box = water_box(n_side=10, seed=1)
    x = jnp.asarray(positions)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(x.shape))
    m = jnp.ones(x.shape[0], jnp.float64) * 10.0
    ps = []
    for method in ("cell", "dense"):
        system = force.create_system(box=box, dtype=jnp.float64,
                                     direct_method=method)
        ps.append(float(instantaneous_pressure(x, v, system, m)))
    assert abs(ps[0] - ps[1]) <= 1e-9 * max(abs(ps[1]), 1.0)


def test_npt_langevin_cell_route():
    """NPT on the cell route: nb reuse + rebuild/attempt at chunk bounds."""
    force, positions, masses, box = water_box(n_side=10, seed=0)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    bonded = water_bonded_params(system.n_atoms // 3, box=box,
                                 dtype=jnp.float64)
    x = jnp.asarray(positions)
    v = jnp.zeros_like(x)
    masses = jnp.asarray(np.asarray(masses), jnp.float64)
    x1, _, box1, diag = npt_langevin_trajectory(
        x, v, system, masses, dt=2e-4, temperature=300.0, friction=5.0,
        pressure_bar=1.0, key=jax.random.PRNGKey(11), n_steps=40,
        bonded=bonded, barostat_interval=20)
    assert np.all(np.isfinite(np.asarray(diag["energies"])))
    assert np.all(np.isfinite(np.asarray(box1)))


def test_molecule_index_salt_singletons():
    """Mixed system: waters are 3-atom components, bare ions singletons."""
    from chargeflux_tpu.models.salt import salt_water_box
    force, _, _, box = salt_water_box(n_side=3, n_ion_pairs=2)
    system = force.create_system(box=box, dtype=jnp.float64)
    mol_id, first_idx, counts = molecule_index(system)
    n_w = (system.n_atoms - 4) // 3
    assert first_idx.shape[0] == n_w + 4
    assert sorted(counts.tolist()).count(1.0) == 4     # 4 bare ions
    assert sorted(counts.tolist()).count(3.0) == n_w


def test_npt_vmaps_over_replicas():
    """Replica-ensemble NPT is plain jax.vmap over (x, v, key): each
    replica carries its own box, dV adaptation and acceptance chain (the
    DP-analog composition the parallel stack uses elsewhere)."""
    system, x, masses, bonded = _npt_setup(3)
    rng = np.random.default_rng(0)
    xb = jnp.stack([x + 0.01 * rng.standard_normal(x.shape)
                    for _ in range(3)])
    keys = jax.random.split(jax.random.PRNGKey(5), 3)

    def one(xr, k):
        x1, _v, b1, diag = npt_langevin_trajectory(
            xr, jnp.zeros_like(xr), system, masses, dt=2e-4,
            temperature=300.0, friction=5.0, pressure_bar=1.0, key=k,
            n_steps=40, bonded=bonded, barostat_interval=20)
        return x1, b1, diag["accepts"]

    x1, b1, acc = jax.vmap(one)(xb, keys)
    assert x1.shape == xb.shape and b1.shape == (3, 3)
    assert bool(jnp.all(jnp.isfinite(x1)))
    # independent acceptance chains -> boxes diverge across replicas
    assert len(np.unique(np.round(np.asarray(b1)[:, 0], 12))) > 1


def test_molecule_index_empty_extras():
    """Empty index arrays in extra_idx are legal (a torsion-only
    BondedParams has bond_idx of shape [0, 2]) — regression for the
    size-0 reshape crash."""
    force, _, _, box = water_box(n_side=3, seed=0)
    system = force.create_system(box=box, dtype=jnp.float64)
    empty = np.zeros((0, 2), np.int64)
    mol_id, first_idx, counts = molecule_index(system, (empty,))
    assert first_idx.shape[0] == system.n_atoms // 3


@pytest.mark.parametrize("scale", [0.99, 1.01])
def test_with_box_scaled_cell_route_oracle_parity(scale):
    """The CELL route (production NPT path) under with_box(s*box) matches
    the f64 oracle at the scaled geometry — the binning, walk image
    offsets and PME/classical recip all read the traced box."""
    force, positions, _, box = water_box(n_side=10, seed=6)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    _, kmax_scaled = ewald_alpha_kmax(force.getCutoffDistance(),
                                      force.getEwaldErrorTolerance(),
                                      np.asarray(box) * scale)
    assert tuple(kmax_scaled) == tuple(system.spec.kmax)
    x_s = jnp.asarray(positions) * scale
    sys_s = system.with_box(jnp.asarray(box) * scale)
    e = float(cf.energy(x_s, sys_s))
    f = np.asarray(cf.forces(x_s, sys_s))
    e_ref, f_ref, _ = energy_forces_pbc(
        np.asarray(positions) * scale, force_to_params(force),
        np.asarray(box) * scale, force.getCutoffDistance(),
        force.getEwaldErrorTolerance())
    assert abs(e - e_ref) <= 1e-10 * abs(e_ref)
    fs = np.abs(f_ref).max()
    np.testing.assert_allclose(f / fs, f_ref / fs, atol=1e-10)


def test_npt_anisotropic_semi_isotropic():
    """Anisotropic MC barostat: per-axis scaling moves only the attempted
    axis; scale_axes=(True, True, False) (membrane-style semi-isotropic)
    never touches z."""
    from chargeflux_tpu.npt import npt_anisotropic_langevin_trajectory

    system, x, masses, bonded = _npt_setup(3)
    v = jnp.zeros_like(x)
    x1, v1, box1, diag = npt_anisotropic_langevin_trajectory(
        x, v, system, masses, dt=2e-4, temperature=300.0, friction=5.0,
        pressure_bar=1.0, key=jax.random.PRNGKey(7), n_steps=100,
        bonded=bonded, barostat_interval=20,
        scale_axes=(True, True, False))
    assert np.all(np.isfinite(np.asarray(diag["energies"])))
    boxes = np.asarray(diag["boxes"])
    axes = np.asarray(diag["axes"])
    accepts = np.asarray(diag["accepts"])
    assert boxes.shape == (5, 3) and axes.shape == (5,)
    assert set(np.unique(axes)).issubset({0, 1})       # z never attempted
    # z axis exactly unchanged throughout
    z0 = float(np.asarray(system.box)[2])
    assert np.all(boxes[:, 2] == z0) and float(box1[2]) == z0
    # an accepted attempt changed exactly its own axis
    prev = np.asarray(system.box)
    for i in range(boxes.shape[0]):
        changed = np.nonzero(boxes[i] != prev)[0]
        if accepts[i]:
            assert changed.tolist() == [int(axes[i])]
        else:
            assert changed.size == 0
        prev = boxes[i]
    assert diag["dv"].shape == (3,)


def test_npt_anisotropic_triclinic_row_scaling():
    """On a triclinic lattice the anisotropic barostat scales whole lattice
    ROWS (reduced form preserved; off-diagonals move with their row)."""
    from chargeflux_tpu.npt import npt_anisotropic_langevin_trajectory

    force, positions, masses, box = water_box(n_side=3, seed=9,
                                              flux="bond_angle",
                                              cutoff=0.42)
    L = np.asarray(box, np.float64)
    B = np.array([[L[0], 0.0, 0.0],
                  [0.15 * L[0], L[1], 0.0],
                  [0.10 * L[0], -0.12 * L[1], L[2]]])
    system = force.create_system(box=B, dtype=jnp.float64)
    bonded = water_bonded_params(27, box=B, dtype=jnp.float64)
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    x = jnp.asarray(positions)
    x1, v1, b1, diag = npt_anisotropic_langevin_trajectory(
        x, jnp.zeros_like(x), system, m, dt=2e-4, temperature=300.0,
        friction=5.0, pressure_bar=1.0, key=jax.random.PRNGKey(3),
        n_steps=100, bonded=bonded, barostat_interval=20)
    assert np.all(np.isfinite(np.asarray(diag["energies"])))
    b1 = np.asarray(b1)
    assert b1.shape == (3, 3)
    # still lower-triangular, and each row is a scalar multiple of the
    # original row (row scaling preserves direction)
    assert b1[0, 1] == 0.0 and b1[0, 2] == 0.0 and b1[1, 2] == 0.0
    for a in range(3):
        s = b1[a, a] / B[a, a]
        np.testing.assert_allclose(b1[a], s * B[a], rtol=1e-12, atol=1e-15)


def test_pressure_tensor_trace_and_symmetry():
    """The strain-derivative pressure tensor is symmetric and its trace/3
    equals the isotropic virial pressure to machine precision (both are
    autodiff of the same assembly — isotropic strain vs full strain)."""
    from chargeflux_tpu.npt import pressure_tensor

    force, positions, masses, box = water_box(n_side=3, seed=9,
                                              flux="bond_angle",
                                              cutoff=0.42)
    system = force.create_system(box=box, dtype=jnp.float64)
    x = jnp.asarray(positions)
    rng = np.random.default_rng(0)
    v = jnp.asarray(0.3 * rng.standard_normal(x.shape))
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    p_iso = float(instantaneous_pressure(x, v, system, m))
    P = np.asarray(pressure_tensor(x, v, system, m))
    assert np.allclose(P, P.T)
    np.testing.assert_allclose(np.trace(P) / 3.0, p_iso, rtol=1e-12)


def test_pressure_tensor_offdiagonal_finite_difference():
    """Off-diagonal stress components match a central finite difference of
    the strained potential (independent of the autodiff path)."""
    from chargeflux_tpu.npt import (BAR_TO_KJ_MOL_NM3, _box_grad_potential,
                                    pressure_tensor)
    from chargeflux_tpu.pairs import box_volume

    force, positions, masses, box = water_box(n_side=3, seed=9,
                                              flux="bond_angle",
                                              cutoff=0.42)
    system = force.create_system(box=box, dtype=jnp.float64)
    x = jnp.asarray(positions)
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    P = np.asarray(pressure_tensor(x, jnp.zeros_like(x), system, m))

    def e_of(eps):
        f = jnp.eye(3, dtype=jnp.float64) + jnp.tril(jnp.asarray(eps))
        return float(_box_grad_potential(
            x @ f, system.with_box(jnp.diag(system.box) @ f), system, None))

    h = 1e-6
    vol = float(box_volume(system.box))
    for (a, b) in [(2, 0), (2, 1)]:
        ep = np.zeros((3, 3)); ep[a, b] = h
        em = np.zeros((3, 3)); em[a, b] = -h
        fd = -(e_of(ep) - e_of(em)) / (2 * h) / (vol * BAR_TO_KJ_MOL_NM3)
        np.testing.assert_allclose(P[a, b], fd, rtol=5e-6)


def test_npt_rigid_water_rattle():
    """NPT with rigid-water constraints: RATTLE-projected BAOAB chunks
    between barostat attempts; the centroid-scaled volume moves translate
    molecules rigidly, so constraint residuals stay at machine zero
    through accepted moves and the 2 fs step runs stable."""
    from chargeflux_tpu.constraints import constraint_residuals
    from chargeflux_tpu.integrate import maxwell_velocities
    from chargeflux_tpu.models import rigid_water_box

    force, pos, masses, box, params = rigid_water_box(n_side=3, cutoff=0.42,
                                                      dtype=jnp.float64)
    system = force.create_system(box=box, dtype=jnp.float64)
    m = jnp.asarray(np.asarray(masses), jnp.float64)
    x = jnp.asarray(pos)
    v0 = maxwell_velocities(m, 300.0, jax.random.PRNGKey(1))
    x1, v1, box1, diag = npt_langevin_trajectory(
        x, v0, system, m, dt=2e-3, temperature=300.0, friction=5.0,
        pressure_bar=1.0, key=jax.random.PRNGKey(2), n_steps=60,
        barostat_interval=20, constraints=params)
    assert np.all(np.isfinite(np.asarray(diag["energies"])))
    assert bool(np.any(np.asarray(diag["accepts"])))
    res = np.asarray(constraint_residuals(x1, params))
    assert np.max(np.abs(res)) < 1e-9
    # velocities stay on the constraint tangent space
    from chargeflux_tpu.constraints import project_velocities
    dv = np.asarray(project_velocities(x1, v1, params)) - np.asarray(v1)
    assert np.max(np.abs(dv)) < 1e-9
