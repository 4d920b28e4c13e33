"""Pallas direct-space kernel parity vs the XLA cell-list path.

Runs in Pallas interpret mode on the CPU backend (the kernel chooses
interpret automatically off-TPU); the same code path compiles with Mosaic on
real TPU hardware.  f32 comparisons (the kernel is the f32 production path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.models import water_box


def _systems(seed=51):
    force, pos, _, box = water_box(n_side=4, flux="bond_angle", cutoff=0.62,
                                   density_spacing=0.62, seed=seed)
    sys_xla = force.create_system(box=box, dtype=jnp.float32,
                                  direct_method="cell")
    sys_pl = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell_pallas")
    return sys_xla, sys_pl, jnp.asarray(pos, jnp.float32)


def test_pallas_energy_matches_cell_list():
    sys_xla, sys_pl, x = _systems()
    e_ref = float(cf.energy(x, sys_xla))
    e_pl = float(cf.energy(x, sys_pl))
    comps = cf.energy_components(x, sys_xla)
    scale = max(abs(float(v)) for v in comps.values())
    assert abs(e_pl - e_ref) <= 2e-6 * scale


def test_pallas_forces_match_cell_list():
    sys_xla, sys_pl, x = _systems()
    f_ref = np.asarray(cf.forces(x, sys_xla))
    f_pl = np.asarray(cf.forces(x, sys_pl))
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(f_pl / scale, f_ref / scale, atol=5e-5)


def test_pallas_dedq_chain_rule_consistency():
    """forces_manual uses grad-wrt-q of the pallas path (the hand dedq
    kernel); it must agree with full autodiff through the custom_vjp."""
    _, sys_pl, x = _systems()
    f_auto = np.asarray(cf.forces(x, sys_pl))
    f_manual = np.asarray(cf.forces_manual(x, sys_pl))
    scale = np.abs(f_auto).max()
    np.testing.assert_allclose(f_manual / scale, f_auto / scale, atol=5e-5)


def test_pallas_force_is_exact_gradient():
    """Central finite differences of the pallas energy (f64 FD is impossible
    in f32; use a relative check at FD-appropriate tolerance)."""
    _, sys_pl, x = _systems()
    f = np.asarray(cf.forces(x, sys_pl))
    rng = np.random.default_rng(2)
    h = 1e-3  # f32: balance truncation vs rounding
    for _ in range(4):
        i = int(rng.integers(0, x.shape[0]))
        d = int(rng.integers(0, 3))
        dx = np.zeros(x.shape, np.float32)
        dx[i, d] = h
        ep = float(cf.energy(x + dx, sys_pl))
        em = float(cf.energy(x - dx, sys_pl))
        fd = -(ep - em) / (2 * h)
        assert f[i, d] == pytest.approx(fd, rel=0.05, abs=20.0), (i, d)
