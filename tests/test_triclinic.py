"""Triclinic (reduced lower-triangular) box support — extension beyond the
reference, which hard-codes orthorhombic boxes (ReferenceCoulKernels.cpp:
513-517, SURVEY §5 quirk 8).

Routes under test: dense direct walk (reduced-form sequential min-image),
classical Ewald with the reciprocal Gram-matrix k^2, and dense SPME in
fractional coordinates.  The independent oracle here is a from-scratch
NumPy f64 triclinic Ewald sum (explicit 27-image minimum search + full
symmetric k-space loop), sharing no code with the engine.
"""

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import chargeflux_tpu as cf
from chargeflux_tpu.models import water_box
from chargeflux_tpu.npt import instantaneous_pressure
from chargeflux_tpu.parallel import make_sharded_energy_fn
from chargeflux_tpu.units import ONE_4PI_EPS0

from scipy.special import erf, erfc  # noqa: E402  (available in the image)


def _shear(box, bx=0.15, cx=0.10, cy=-0.12):
    """Reduced triclinic lattice from an orthorhombic [3] box."""
    L = np.asarray(box, np.float64)
    return np.array([[L[0], 0.0, 0.0],
                     [bx * L[0], L[1], 0.0],
                     [cx * L[0], cy * L[1], L[2]]])


def _system(flux="none", shear=True, **kw):
    force, pos, _, box = water_box(n_side=3, flux=flux, cutoff=0.42,
                                   seed=21)
    b = _shear(box) if shear else np.asarray(box)
    system = force.create_system(box=b, dtype=jnp.float64, **kw)
    return force, system, jnp.asarray(pos), b


# ---------------------------------------------------------------------------
# independent NumPy oracle
# ---------------------------------------------------------------------------


def _oracle_triclinic(x, q, sig, eps, excl, B, rc, alpha, kmax):
    """Fixed-charge triclinic Ewald: self + direct erfc + LJ + (-erf)
    exclusions + full-space reciprocal sum.  Minimum image by explicit
    search over the 27 neighbor cells (independent of the engine's
    sequential reduced-form wrap)."""
    ke = ONE_4PI_EPS0
    n = len(q)
    e_self = -ke * alpha / math.sqrt(math.pi) * np.sum(q * q)

    shifts = np.array(list(itertools.product((-1, 0, 1), repeat=3))) @ B
    exset = {(min(a, b), max(a, b)) for a, b in excl}
    e_dir = e_lj = e_excl = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = x[j] - x[i] + shifts
            r = np.sqrt(np.sum(d * d, axis=1)).min()
            qq = ke * q[i] * q[j]
            if (i, j) in exset:
                e_excl -= qq * erf(alpha * r) / r
            elif r < rc:
                e_dir += qq * erfc(alpha * r) / r
                s = 0.5 * (sig[i] + sig[j])
                e_lj += 4.0 * math.sqrt(eps[i] * eps[j]) * (
                    (s / r) ** 12 - (s / r) ** 6)

    vol = abs(np.linalg.det(B))
    binv_t = np.linalg.inv(B).T
    kx, ky, kz = kmax
    e_rec = 0.0
    for nx in range(-(kx - 1), kx):
        for ny in range(-(ky - 1), ky):
            for nz in range(-(kz - 1), kz):
                if nx == 0 and ny == 0 and nz == 0:
                    continue
                k = 2.0 * math.pi * (np.array([nx, ny, nz]) @ binv_t)
                k2 = float(k @ k)
                phase = x @ k
                s_re = np.sum(q * np.cos(phase))
                s_im = np.sum(q * np.sin(phase))
                e_rec += (math.exp(-k2 / (4 * alpha * alpha)) / k2
                          * (s_re ** 2 + s_im ** 2))
    e_rec *= 2.0 * math.pi * ke / vol
    return e_self + e_dir + e_lj + e_excl + e_rec


def test_sheared_box_matches_bruteforce_oracle():
    force, system, x, B = _system(flux="none", recip_method="xla")
    spec = system.spec
    qv = np.asarray(system.q0)
    e_oracle = _oracle_triclinic(
        np.asarray(x), qv, np.asarray(system.sigma),
        np.asarray(system.epsilon),
        np.asarray(system.exclusions).tolist(),
        B, spec.cutoff, spec.alpha, spec.kmax)
    e = float(cf.energy(x, system))
    assert abs(e - e_oracle) / abs(e_oracle) < 1e-10


def test_epsilon_shear_converges_to_orthorhombic():
    # the triclinic code path with a vanishing shear must agree with the
    # orthorhombic implementation (different min-image + k^2 code)
    force, pos, _, box = water_box(n_side=3, flux="bond_angle", cutoff=0.42,
                                   seed=22)
    s_ortho = force.create_system(box=box, dtype=jnp.float64)
    s_tri = force.create_system(box=_shear(box, 1e-9, 1e-9, 1e-9),
                                dtype=jnp.float64)
    assert s_tri.box.ndim == 2  # really took the triclinic path
    assert s_tri.spec.kmax == s_ortho.spec.kmax
    x = jnp.asarray(pos)
    e0, e1 = float(cf.energy(x, s_ortho)), float(cf.energy(x, s_tri))
    # the total cancels across components; a 1e-9 nm shear legitimately
    # moves E by ~|dE/d(b_x)|*1e-9, so compare on the component scale
    scale = max(abs(float(v))
                for v in cf.energy_components(x, s_ortho).values())
    assert abs(e1 - e0) < 1e-6 * scale
    f0, f1 = np.asarray(cf.forces(x, s_ortho)), np.asarray(cf.forces(x, s_tri))
    assert np.max(np.abs(f1 - f0)) < 1e-6 * np.max(np.abs(f0))


def test_diagonal_matrix_collapses_to_orthorhombic():
    force, pos, _, box = water_box(n_side=3, flux="water", cutoff=0.42)
    s_vec = force.create_system(box=box, dtype=jnp.float64)
    s_mat = force.create_system(box=np.diag(box), dtype=jnp.float64)
    assert s_mat.box.ndim == 1 and s_mat.spec == s_vec.spec
    x = jnp.asarray(pos)
    assert float(cf.energy(x, s_vec)) == float(cf.energy(x, s_mat))


def test_flux_forces_grad_vs_finite_differences():
    force, system, x, _ = _system(flux="bond_angle")
    g = np.asarray(cf.forces(x, system))
    rng = np.random.default_rng(3)
    v = rng.standard_normal(x.shape)
    v /= np.linalg.norm(v)
    h = 1e-6
    ep = float(cf.energy(x + h * jnp.asarray(v), system))
    em = float(cf.energy(x - h * jnp.asarray(v), system))
    fd = -(ep - em) / (2 * h)
    np.testing.assert_allclose(np.sum(g * v), fd, rtol=1e-6, atol=1e-7)


def test_translation_invariance():
    _, system, x, _ = _system(flux="water")
    t = jnp.asarray(np.array([0.731, -1.234, 2.925]))
    e0 = float(cf.energy(x, system))
    e1 = float(cf.energy(x + t, system))
    assert abs(e1 - e0) < 1e-9 * abs(e0)


def test_pme_matches_classical_on_triclinic():
    _, s_xla, x, _ = _system(flux="bond_angle", recip_method="xla")
    _, s_pme, _, _ = _system(flux="bond_angle", recip_method="pme")
    r_xla = float(cf.energy_components(x, s_xla)["reciprocal"])
    r_pme = float(cf.energy_components(x, s_pme)["reciprocal"])
    # two different reciprocal algorithms, each truncated at ~ewald_tol
    assert abs(r_pme - r_xla) / abs(r_xla) < 5e-4
    g_xla = np.asarray(cf.forces(x, s_xla))
    g_pme = np.asarray(cf.forces(x, s_pme))
    rms = np.sqrt(np.mean(g_xla ** 2))
    assert np.sqrt(np.mean((g_pme - g_xla) ** 2)) / rms < 1e-4


def test_virial_pressure_finite():
    _, system, x, _ = _system(flux="bond_angle")
    masses = jnp.ones(x.shape[0], jnp.float64)
    p = float(instantaneous_pressure(x, jnp.zeros_like(x), system, masses))
    assert np.isfinite(p)


def test_sharded_energy_matches_single_device():
    _, system, x, _ = _system(flux="water")
    mesh = Mesh(np.array(jax.devices()[:8]), ("space",))
    e_ref = float(cf.energy(x, system))
    e_sh = float(make_sharded_energy_fn(system, mesh)(x))
    assert abs(e_sh - e_ref) <= 1e-12 * max(abs(e_ref), 1.0)


def test_validation_errors():
    force, pos, _, box = water_box(n_side=3, cutoff=0.42)
    bad = _shear(box)
    bad[0, 1] = 0.1  # upper-triangular entry
    with pytest.raises(ValueError, match="lower-triangular"):
        force.create_system(box=bad, dtype=jnp.float64)
    unreduced = _shear(box, bx=0.9)  # |b_x| > a_x/2
    with pytest.raises(ValueError, match="reduced"):
        force.create_system(box=unreduced, dtype=jnp.float64)
    # the 3-side box's perpendicular widths fit < 3 cells at this cutoff,
    # so the (now triclinic-capable) cell route must refuse loudly
    with pytest.raises(ValueError, match="too small for a cell list"):
        force.create_system(box=_shear(box), dtype=jnp.float64,
                            direct_method="cell")
    force.setCutoffDistance(0.9)  # > half min perpendicular width
    with pytest.raises(ValueError, match="perpendicular"):
        force.create_system(box=_shear(box), dtype=jnp.float64)


# ---------------------------------------------------------------------------
# triclinic cell route (fractional binning + lattice-row image offsets)
# ---------------------------------------------------------------------------


def _big_system(direct_method, recip_method="xla", **kw):
    """6^3-water box (648 atoms) — large enough for a >=3-cell grid on the
    sheared lattice's perpendicular widths."""
    force, pos, masses, box = water_box(n_side=6, flux="water", cutoff=0.42,
                                        seed=3)
    B = _shear(box)
    system = force.create_system(box=B, dtype=jnp.float64,
                                 direct_method=direct_method,
                                 recip_method=recip_method, **kw)
    return force, system, jnp.asarray(pos), masses, B


def test_cell_walk_matches_dense_on_triclinic():
    # the fractional-binned half-shell walk with lattice-row image offsets
    # must reproduce the (independently validated) dense min-image route
    _, s_dense, x, _, _ = _big_system("dense")
    _, s_cell, x2, _, _ = _big_system("cell")
    assert s_cell.spec.cell_grid is not None
    e_d = float(cf.energy(x, s_dense))
    e_c = float(cf.energy(x2, s_cell))
    assert abs(e_c - e_d) <= 1e-12 * abs(e_d)
    f_d = np.asarray(cf.forces(x, s_dense))
    f_c = np.asarray(cf.forces(x, s_cell))
    rms = np.sqrt(np.mean(f_d ** 2))
    assert np.sqrt(np.mean((f_c - f_d) ** 2)) / rms < 1e-13


def test_cell_shift_layout_matches_on_triclinic():
    _, s_dense, x, _, _ = _big_system("dense")
    _, s_shift, _, _, _ = _big_system("cell", walk_layout="shift")
    e_d = float(cf.energy(x, s_dense))
    e_s = float(cf.energy(x, s_shift))
    assert abs(e_s - e_d) <= 1e-11 * abs(e_d)


def test_pme_cell_spread_matches_dense_spread_on_triclinic():
    # the cell-blocked fractional spread and the dense fractional spread
    # are the same algorithm on the same mesh — reduction-order rounding
    from chargeflux_tpu import cells
    from chargeflux_tpu.charges import effective_charges
    from chargeflux_tpu.pme import (pme_cell_reciprocal_energy,
                                    pme_reciprocal_energy)

    _, system, x, _, _ = _big_system("cell", recip_method="pme")
    spec = system.spec
    q = effective_charges(x, system)
    slots, inv_slot, _ = cells.build_cell_list_full(
        x, system.box, spec.cell_grid, spec.cell_capacity)
    blocks = cells.blockify(x, q, system, slots, inv_slot)
    ids = slots.reshape(blocks.x.shape)
    e_cell = float(pme_cell_reciprocal_energy(blocks, ids, system))
    e_dense = float(pme_reciprocal_energy(x, q, system.box, spec.alpha,
                                          spec.pme_grid, spec.pme_order))
    assert abs(e_cell - e_dense) <= 1e-10 * abs(e_dense)


def test_halo_sharding_matches_on_triclinic():
    from chargeflux_tpu.parallel.halo import (halo_compatible,
                                              make_halo_energy_fn)

    _, system, x, _, _ = _big_system("cell")
    ndev = 4
    assert halo_compatible(system, ndev)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("space",))
    e_ref = float(cf.energy(x, system))
    e_fn = make_halo_energy_fn(system, mesh)
    e_h = float(e_fn(x))
    assert abs(e_h - e_ref) <= 1e-12 * abs(e_ref)
    f_ref = np.asarray(cf.forces(x, system))
    f_h = np.asarray(-jax.jit(jax.grad(e_fn))(x))
    rms = np.sqrt(np.mean(f_ref ** 2))
    assert np.sqrt(np.mean((f_h - f_ref) ** 2)) / rms < 1e-13


def test_halo_2d_decomposition_matches_on_triclinic():
    """2-D x-by-y bricks on a sheared lattice: the y-halo planes crossing
    the global boundary pick up the FULL lattice row b = (B[1,0], B[1,1],
    0) at exchange time — the off-diagonal x component is the part a
    naive per-axis wrap would drop."""
    from chargeflux_tpu.parallel.halo import make_halo_energy_fn

    _, system, x, _, _ = _big_system("cell")
    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    e_ref = float(cf.energy(x, system))
    f_ref = np.asarray(cf.forces(x, system))
    rms = np.sqrt(np.mean(f_ref ** 2))
    for decomp in [(2, 2), (1, 4)]:
        e_fn = make_halo_energy_fn(system, mesh, decomp=decomp)
        e_h = float(e_fn(x))
        assert abs(e_h - e_ref) <= 1e-11 * abs(e_ref), decomp
        f_h = np.asarray(-jax.jit(jax.grad(e_fn))(x))
        assert np.sqrt(np.mean((f_h - f_ref) ** 2)) / rms < 1e-12, decomp


def test_nve_neighbor_reuse_on_triclinic():
    # neighbor-reuse driver across rebuild boundaries: frozen triclinic
    # wrap offsets must keep the reused binning exact — the cell-route
    # trajectory must match the dense-route trajectory step for step
    # (the lattice cold-start's own energy drift is physical and
    # identical on both routes, so it cancels out of this comparison)
    from chargeflux_tpu.integrate import (init_state, init_state_nb,
                                          make_energy_fn, make_nb_energy_fn,
                                          nve_trajectory, nve_trajectory_nb)
    from chargeflux_tpu.models import water_bonded_params

    force, system, x, masses, B = _big_system("cell")
    s_dense = force.create_system(box=B, dtype=jnp.float64,
                                  direct_method="dense", recip_method="xla")
    bonded = water_bonded_params(216, box=B, dtype=jnp.float64)
    m = jnp.asarray(masses, jnp.float64)
    v0 = jnp.zeros_like(x)

    e_nb, init_nb = make_nb_energy_fn(system, bonded=bonded)
    s = init_state_nb(x, v0, e_nb, init_nb)
    _, etot_nb = nve_trajectory_nb(s, e_nb, init_nb, m, dt=5e-4, n_steps=20,
                                   rebuild_every=5)
    e_fn = make_energy_fn(s_dense, bonded=bonded)
    _, etot_d = nve_trajectory(init_state(x, v0, e_fn), e_fn, m, 5e-4, 20)

    e_nb_arr = np.asarray(etot_nb)
    assert np.all(np.isfinite(e_nb_arr))
    np.testing.assert_allclose(e_nb_arr, np.asarray(etot_d), rtol=1e-12)


def test_npt_barostat_runs_on_triclinic():
    # isotropic MC barostat over a triclinic lattice: box1 = s*B keeps the
    # reduced form; volume/acceptance bookkeeping must use det, not prod
    from chargeflux_tpu.models import water_bonded_params
    from chargeflux_tpu.npt import npt_langevin_trajectory
    force, pos, masses, box = water_box(n_side=3, flux="bond_angle",
                                        cutoff=0.42, seed=9)
    system = force.create_system(box=_shear(box), dtype=jnp.float64)
    bonded = water_bonded_params(27, box=_shear(box), dtype=jnp.float64)
    m = jnp.asarray(masses, jnp.float64)
    key = jax.random.PRNGKey(4)
    x, v, b, diag = npt_langevin_trajectory(
        jnp.asarray(pos), jnp.zeros((81, 3), jnp.float64), system, m,
        dt=5e-4, temperature=300.0, friction=5.0, pressure_bar=1.0,
        key=key, n_steps=40, bonded=bonded, barostat_interval=20)
    assert b.shape == (3, 3)
    assert np.all(np.isfinite(np.asarray(diag["energies"])))
    # scaling preserves the lattice shape ratios
    b = np.asarray(b)
    B0 = _shear(box)
    s = b[0, 0] / B0[0, 0]
    np.testing.assert_allclose(b, s * B0, rtol=1e-12)


@pytest.mark.parametrize("recip", ["pme", "xla"])
def test_f32_force_rmse_budget_triclinic_cell(recip):
    """f32 production path on the TRICLINIC cell route: force RMSE vs the
    f64 classical reference <= 1e-4 relative — pins the precision choices
    (BF16_BF16_F32_X3 dots, erfc polynomial) through the fractional
    binning, lattice-row offsets and fractional PME spread."""
    from chargeflux_tpu.energy import _energy_and_forces

    force, pos, _, box = water_box(n_side=7, flux="bond_angle", cutoff=0.65,
                                   seed=13)
    B = _shear(box)
    sys64 = force.create_system(box=B, dtype=jnp.float64,
                                direct_method="cell")
    x64 = jnp.asarray(pos, jnp.float64)
    _, f64 = _energy_and_forces(x64, sys64)
    rms = np.sqrt(np.mean(np.asarray(f64) ** 2))

    sys32 = force.create_system(box=B, dtype=jnp.float32,
                                direct_method="cell", recip_method=recip)
    x32 = jnp.asarray(pos, jnp.float32)
    _, f32 = _energy_and_forces(x32, sys32)
    err = np.sqrt(np.mean((np.asarray(f32, np.float64)
                           - np.asarray(f64)) ** 2)) / rms
    assert err < 1e-4, err
