"""Calibrate the PME grid heuristic: measured f64 force RMSE vs converged
classical Ewald across (order, grid), fitting relF ~= C_p (alpha h)^p.

The fitted prefactors feed pme._ERR_PREFACTOR / pme_grid_size.
Run on CPU: python tools/calibrate_pme.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from chargeflux_tpu.charges import effective_charges  # noqa: E402
from chargeflux_tpu.ewald import reciprocal_energy  # noqa: E402
from chargeflux_tpu.models import water_box  # noqa: E402
from chargeflux_tpu.pme import pme_reciprocal_energy  # noqa: E402


def main():
    force, pos, _, box = water_box(n_side=4, flux="bond_angle", seed=9)
    system = force.create_system(box=box, dtype=jnp.float64)
    x = jnp.asarray(pos)
    b = jnp.asarray(box)
    q = effective_charges(x, system)
    alpha = system.spec.alpha

    g_ref = np.asarray(jax.grad(
        lambda xx: reciprocal_energy(xx, q, b, alpha, (33, 33, 33)))(x))
    rms_ref = np.sqrt(np.mean(g_ref ** 2))

    for order in (4, 6, 8):
        cs = []
        for g in (16, 24, 32, 48):
            gr = np.asarray(jax.grad(
                lambda xx: pme_reciprocal_energy(
                    xx, q, b, alpha, (g, g, g), order))(x))
            ferr = np.sqrt(np.mean((gr - g_ref) ** 2)) / rms_ref
            ah = alpha * float(box[0]) / g
            c = ferr / ah ** order
            cs.append(c)
            print(f"p={order} G={g:3d} alpha*h={ah:.3f} "
                  f"relFrms={ferr:.3e}  C={c:.3f}")
        print(f"p={order}: C_p ~= {np.median(cs):.3f}")


if __name__ == "__main__":
    main()
