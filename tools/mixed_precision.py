"""Mixed-precision pass (VERDICT r1 item 9): measured accept/reject table.

For each candidate precision change: force RMSE vs the f64 reference on the
4k box (error; CPU, bf16 rounding applied explicitly so it's faithful), and
step time at 30k on the TPU (speed).  Budget: total force RMSE <= 1e-4
relative (BASELINE config 4).

Usage:
  python tools/mixed_precision.py error   (CPU)
  python tools/mixed_precision.py speed   (TPU)
"""

import sys
from functools import partial

import numpy as np


def error_pass():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from chargeflux_tpu.charges import effective_charges
    from chargeflux_tpu.energy import _energy_and_forces
    from chargeflux_tpu.models import water_box
    from chargeflux_tpu.pme import (bspline, influence_function,
                                    pme_grid_size, pme_reciprocal_energy,
                                    spread_weights)

    force, pos, _, box = water_box(n_side=11, flux="bond_angle", seed=3)
    sys64 = force.create_system(box=box, dtype=jnp.float64)
    x64 = jnp.asarray(pos)
    _, f_ref = _energy_and_forces(x64, sys64)
    f_ref = np.asarray(f_ref)
    rms = np.sqrt(np.mean(f_ref ** 2))

    def rel(f):
        return float(np.sqrt(np.mean((np.asarray(f, np.float64) - f_ref) ** 2)) / rms)

    # baseline f32 (current production path, PME)
    sys32 = force.create_system(box=box, dtype=jnp.float32,
                                recip_method="pme")
    x32 = jnp.asarray(pos, jnp.float32)
    _, f32 = _energy_and_forces(x32, sys32)
    print(f"f32 production (PME, X3 pins)        relF = {rel(f32):.2e}  "
          f"budget 1e-4")

    # candidate: bf16 B-spline weights in the PME spread (f32 accum)
    spec = sys32.spec
    alpha = spec.alpha
    grid = spec.pme_grid
    order = spec.pme_order
    q32 = effective_charges(x32, sys32)

    def pme_bf16_weights(xx):
        gx, gy, gz = grid
        frac = xx / sys32.box
        frac = frac - jax.lax.stop_gradient(jnp.floor(frac))
        u = frac * jnp.asarray(np.asarray(grid), jnp.float32)
        wx = spread_weights(u[:, 0], gx, order).astype(jnp.bfloat16)
        wy = spread_weights(u[:, 1], gy, order).astype(jnp.bfloat16)
        wz = spread_weights(u[:, 2], gz, order).astype(jnp.bfloat16)
        cwx = (q32.astype(jnp.bfloat16)[:, None] * wx).T

        def col(c):
            return jnp.matmul((wy * c[:, None]).T, wz,
                              preferred_element_type=jnp.float32)
        qgrid = jax.lax.map(col, cwx, batch_size=8)
        qhat = jnp.fft.rfftn(qgrid.astype(jnp.float32))
        d = influence_function(grid, sys32.box, alpha, order, jnp.float32)
        return jnp.sum(d * (qhat.real ** 2 + qhat.imag ** 2))

    g_bf16 = jax.grad(pme_bf16_weights)(x32)
    g_pme64 = jax.grad(lambda xx: pme_reciprocal_energy(
        xx, effective_charges(xx, sys64), sys64.box, sys64.spec.alpha,
        grid, order))(x64)
    recip_rms = np.sqrt(np.mean(np.asarray(g_pme64) ** 2))
    err = float(np.sqrt(np.mean(
        (np.asarray(g_bf16, np.float64) - np.asarray(g_pme64)) ** 2)) / recip_rms)
    print(f"PME spread with bf16 weights          relF(recip) = {err:.2e}")

    # candidate: bf16 LJ prefactors in the direct walk
    import dataclasses
    sys_lj = dataclasses.replace(
        sys32,
        sigma=sys32.sigma.astype(jnp.bfloat16).astype(jnp.float32),
        epsilon=sys32.epsilon.astype(jnp.bfloat16).astype(jnp.float32))
    _, f_lj = _energy_and_forces(x32, sys_lj)
    print(f"bf16-rounded LJ parameters             relF = {rel(f_lj):.2e}")

    # candidate: bf16 pair coordinates (expected reject)
    x_b = x32.astype(jnp.bfloat16).astype(jnp.float32)
    _, f_xb = _energy_and_forces(x_b, sys32)
    print(f"bf16-rounded coordinates               relF = {rel(f_xb):.2e}  "
          f"(expected reject)")


def speed_pass():
    import time

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from bench import _timed_scan, build
    from chargeflux_tpu.energy import _energy

    x, system, _ = build("30k")

    def loop(f):
        def step(xx):
            e, g = jax.value_and_grad(f)(xx)
            return xx - 1e-9 * g, e

        @partial(jax.jit, static_argnums=(1,))
        def run(x0, k):
            xk, es = jax.lax.scan(lambda xx, _: step(xx), x0, None, length=k)
            return es[-1] + 0.0 * jnp.sum(xk)

        return _timed_scan(run, x, 3, 23, reps=5)

    print("full fwd+grad f32:", loop(lambda xx: _energy(xx, system)))


if __name__ == "__main__":
    if "speed" in sys.argv:
        speed_pass()
    else:
        error_pass()
