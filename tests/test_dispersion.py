"""Long-range LJ dispersion (tail) correction: E += C/V.

Extension beyond the reference (which truncates LJ at the cutoff with no
correction, ReferenceCoulKernels.cpp:572-577); the standard homogeneous
tail formula with Lorentz-Berthelot mixing, evaluated exactly in O(N) by
binomial moments (system.dispersion_tail_coefficient).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import chargeflux_tpu as cf
from chargeflux_tpu.models import water_box
from chargeflux_tpu.npt import BAR_TO_KJ_MOL_NM3, instantaneous_pressure
from chargeflux_tpu.parallel import make_sharded_energy_fn
from chargeflux_tpu.system import CoulForce, dispersion_tail_coefficient


def _bruteforce_coeff(sig, eps, rc):
    """O(N^2) reference for the moment-factorized coefficient."""
    total = 0.0
    n = len(sig)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            s = 0.5 * (sig[i] + sig[j])
            e4 = 4.0 * math.sqrt(eps[i] * eps[j])
            total += e4 * (s ** 12 / (9.0 * rc ** 9)
                           - s ** 6 / (3.0 * rc ** 3))
    return 2.0 * math.pi * total


def test_coefficient_matches_bruteforce():
    rng = np.random.default_rng(7)
    sig = rng.uniform(0.2, 0.4, 37)
    eps = rng.uniform(0.0, 1.2, 37)
    eps[::5] = 0.0  # zero-epsilon classes (water hydrogens) must be exact
    for rc in (0.8, 1.2):
        fast = dispersion_tail_coefficient(sig, eps, rc)
        slow = _bruteforce_coeff(sig, eps, rc)
        assert abs(fast - slow) <= 1e-9 * abs(slow)


def _pair(n_side=3, **kw):
    """(system_without, system_with_tail, positions, box) on one builder."""
    force, pos, _, box = water_box(n_side=n_side, flux="bond_angle", seed=11)
    sys_off = force.create_system(box=box, dtype=jnp.float64, **kw)
    force.setUseDispersionCorrection(True)
    sys_on = force.create_system(box=box, dtype=jnp.float64, **kw)
    return sys_off, sys_on, jnp.asarray(pos), box


def test_energy_shift_and_component():
    sys_off, sys_on, x, box = _pair()
    c = sys_on.spec.tail_coeff
    vol = float(np.prod(box))
    assert c < 0.0  # attractive tail dominates for water
    comps = cf.energy_components(x, sys_on)
    assert "dispersion" in comps
    assert abs(float(comps["dispersion"]) - c / vol) <= 1e-12 * abs(c / vol)
    de = float(cf.energy(x, sys_on)) - float(cf.energy(x, sys_off))
    assert abs(de - c / vol) <= 1e-10 * abs(c / vol)


def test_forces_unchanged():
    sys_off, sys_on, x, _ = _pair()
    f0 = np.asarray(cf.forces(x, sys_off))
    f1 = np.asarray(cf.forces(x, sys_on))
    np.testing.assert_allclose(f1, f0, rtol=0, atol=1e-12)


def test_virial_pressure_includes_tail():
    # P_tail = C / V^2: the dE/ds route must pick it up from the traced box.
    sys_off, sys_on, x, box = _pair()
    masses = jnp.ones(x.shape[0], jnp.float64)
    v = jnp.zeros_like(x)
    p0 = float(instantaneous_pressure(x, v, sys_off, masses))
    p1 = float(instantaneous_pressure(x, v, sys_on, masses))
    vol = float(np.prod(box))
    expect = sys_on.spec.tail_coeff / vol ** 2 / BAR_TO_KJ_MOL_NM3
    assert abs((p1 - p0) - expect) <= 1e-8 * abs(expect)


def test_virial_pressure_includes_tail_cell_route():
    # The cell-route virial reassembles components manually (npt.e_scaled).
    force, pos, _, box = water_box(n_side=4, flux="bond_angle", cutoff=0.62,
                                   density_spacing=0.62, seed=12)
    kw = dict(box=box, dtype=jnp.float64, direct_method="cell")
    sys_off = force.create_system(**kw)
    force.setUseDispersionCorrection(True)
    sys_on = force.create_system(**kw)
    x = jnp.asarray(pos)
    masses = jnp.ones(x.shape[0], jnp.float64)
    v = jnp.zeros_like(x)
    p0 = float(instantaneous_pressure(x, v, sys_off, masses))
    p1 = float(instantaneous_pressure(x, v, sys_on, masses))
    vol = float(np.prod(box))
    expect = sys_on.spec.tail_coeff / vol ** 2 / BAR_TO_KJ_MOL_NM3
    assert abs((p1 - p0) - expect) <= 1e-8 * abs(expect)


def test_sharded_energy_matches_single_device():
    _, sys_on, x, _ = _pair()
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ("space",))
    e_ref = float(cf.energy(x, sys_on))
    e_sh = float(make_sharded_energy_fn(sys_on, mesh)(x))
    assert abs(e_sh - e_ref) <= 1e-12 * max(abs(e_ref), 1.0)


def test_requires_pbc():
    force = CoulForce()
    force.addParticle(0.0, 0.3, 0.5)
    force.setUseDispersionCorrection(True)
    try:
        force.create_system()
    except ValueError as e:
        assert "dispersion" in str(e)
    else:
        raise AssertionError("expected ValueError without PBC")


def test_serialization_roundtrip():
    force, _, _, _ = water_box(n_side=2, seed=5)
    force.setUseDispersionCorrection(True)
    d = force.to_dict()
    back = CoulForce.from_dict(d)
    assert back.getUseDispersionCorrection() is True
    assert CoulForce.from_dict(CoulForce().to_dict() | {
        "particles": [[0.0, 0.3, 0.5]]}).getUseDispersionCorrection() is False


def test_with_particle_parameters_recomputes_tail():
    sys_off, sys_on, x, box = _pair()
    # q0 swap: no tail change, energy responds to the new charges
    e0 = float(cf.energy(x, sys_on))
    sys_q = sys_on.with_particle_parameters(q0=sys_on.q0 * 0.5)
    assert float(cf.energy(x, sys_q)) != e0
    assert sys_q.spec.tail_coeff == sys_on.spec.tail_coeff
    # epsilon swap: static tail coefficient must track the new parameters
    sys_e = sys_on.with_particle_parameters(epsilon=sys_on.epsilon * 2.0)
    assert abs(sys_e.spec.tail_coeff - 2.0 * sys_on.spec.tail_coeff) \
        <= 1e-9 * abs(sys_on.spec.tail_coeff)
    try:
        sys_on.with_particle_parameters(q0=jnp.zeros(3))
    except ValueError as err:
        assert "shape" in str(err)
    else:
        raise AssertionError("expected shape mismatch error")


def test_halo_sharded_energy_includes_tail_once():
    # the halo route adds the tail replicated (outside its psum) — must
    # count once regardless of device count
    from chargeflux_tpu.parallel.halo import halo_compatible, \
        make_halo_energy_fn
    force, pos, _, box = water_box(n_side=8, flux="bond_angle", cutoff=0.29,
                                   seed=13)
    force.setUseDispersionCorrection(True)
    system = force.create_system(box=box, dtype=jnp.float64,
                                 direct_method="cell")
    assert system.spec.tail_coeff is not None
    assert halo_compatible(system, 8)
    x = jnp.asarray(pos)
    e_ref = float(cf.energy(x, system))
    mesh = Mesh(np.array(jax.devices()[:8]), ("space",))
    e_halo = float(make_halo_energy_fn(system, mesh)(x))
    assert abs(e_halo - e_ref) <= 1e-12 * max(abs(e_ref), 1.0)
