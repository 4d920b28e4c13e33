"""Fused Pallas structure-factor kernel parity vs the XLA matmul path.

Interpret mode on CPU; the same code Mosaic-compiles on TPU.  f32 (the
kernel's production precision)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chargeflux_tpu as cf
from chargeflux_tpu.charges import effective_charges
from chargeflux_tpu.ewald import reciprocal_energy, structure_factors
from chargeflux_tpu.models import water_box


def _setup(seed=81):
    force, pos, _, box = water_box(n_side=3, flux="bond_angle", seed=seed)
    system = force.create_system(box=box, dtype=jnp.float32)
    x = jnp.asarray(pos, jnp.float32)
    q = effective_charges(x, system)
    return system, x, q


def test_structure_factors_match_xla():
    system, x, q = _setup()
    spec = system.spec
    sc_x, ss_x = jax.jit(lambda a, b: structure_factors(
        a, b, system.box, spec.kmax, method="xla"))(x, q)
    sc_p, ss_p = jax.jit(lambda a, b: structure_factors(
        a, b, system.box, spec.kmax, method="pallas"))(x, q)
    scale = float(jnp.abs(sc_x).max())
    np.testing.assert_allclose(np.asarray(sc_p) / scale,
                               np.asarray(sc_x) / scale, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ss_p) / scale,
                               np.asarray(ss_x) / scale, atol=1e-5)


def test_recip_energy_and_forces_match_xla():
    system, x, q = _setup()
    spec = system.spec

    def e_fn(method):
        def f(xc):
            qc = effective_charges(xc, system)
            return reciprocal_energy(xc, qc, system.box, spec.alpha,
                                     spec.kmax, method=method)
        return f

    e_x, g_x = jax.jit(jax.value_and_grad(e_fn("xla")))(x)
    e_p, g_p = jax.jit(jax.value_and_grad(e_fn("pallas")))(x)
    assert float(e_p) == pytest.approx(float(e_x), rel=2e-5)
    scale = float(jnp.abs(g_x).max())
    np.testing.assert_allclose(np.asarray(g_p) / scale,
                               np.asarray(g_x) / scale, atol=2e-5)


def test_full_engine_with_pallas_recip():
    force, pos, _, box = water_box(n_side=3, flux="bond_angle", seed=82)
    s_xla = force.create_system(box=box, dtype=jnp.float32)
    s_pl = force.create_system(box=box, dtype=jnp.float32,
                               recip_method="pallas")
    x = jnp.asarray(pos, jnp.float32)
    e_x, f_x = cf.energy_and_forces(x, s_xla)
    e_p, f_p = cf.energy_and_forces(x, s_pl)
    assert float(e_p) == pytest.approx(float(e_x), rel=1e-4)
    scale = float(jnp.abs(f_x).max())
    np.testing.assert_allclose(np.asarray(f_p) / scale,
                               np.asarray(f_x) / scale, atol=2e-5)
