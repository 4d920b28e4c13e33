"""Attribute the PME reciprocal in-context cost at the 30k bench config.

BASELINE.md: recip in-context marginal 0.90-1.09 ms but the spread kernel
alone (prebuilt weights) is 0.46 ms fwd+bwd.  This times the pieces in one
process:

  base       charges+blockify+self+excl (reference)
  weights    + B-spline weight construction only (fwd+bwd)
  spread_sg  + full recip but weights built from stop_gradient'd blocks
             (no bspline backward; kernel+folds+FFT+influence fwd+bwd)
  recip      + full recip (production)
"""

import json
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan, build  # noqa: E402
from chargeflux_tpu import cells  # noqa: E402
from chargeflux_tpu.charges import effective_charges  # noqa: E402
from chargeflux_tpu.energy import _exclusion_correction  # noqa: E402
from chargeflux_tpu.ewald import self_energy  # noqa: E402
from chargeflux_tpu.neighbors import build_neighbor_state  # noqa: E402
from chargeflux_tpu import pme as pme_mod  # noqa: E402
from chargeflux_tpu.pme import (_patch_origins, _patch_width, bspline,  # noqa: E402
                                pme_cell_pallas_reciprocal_energy)


def main():
    x, system, _ = build("30k")
    spec = system.spec
    nb = build_neighbor_state(x, system)
    ids = nb.slots.reshape(spec.cell_grid + (spec.cell_capacity,))

    def base_terms(xx):
        q = effective_charges(xx, system)
        b = cells.blockify(xx, q, system, nb.slots, nb.inv_slot, wrap=nb.wrap)
        e = (jnp.sum(b.x) * 1e-20 + self_energy(q, spec.alpha)
             + _exclusion_correction(xx, q, system, True))
        return e, b

    def weights_sum(b, dtype):
        """All three weight tensors as the production path builds them."""
        box = system.box
        order = spec.pme_order
        ngx, ngy, ngz = spec.cell_grid
        gx, gy, gz = spec.pme_grid

        def compact(coord, n_cells, grid_n, length, cell_axis):
            extra = spec.pme_slack[cell_axis]
            u = coord * (grid_n / length)
            org = _patch_origins(n_cells, grid_n, order, extra)
            w = _patch_width(n_cells, grid_n, order, extra)
            shape = [1, 1, 1, 1, 1]
            shape[cell_axis] = n_cells
            base = jnp.asarray(org, dtype).reshape(shape)
            j = jnp.arange(w, dtype=dtype).reshape(1, 1, w, 1, 1)
            t = u[:, :, None, :, :] - (base + j)
            return bspline(t, order)

        wlxt = compact(b.x, ngx, gx, box[0], 0)
        wlyt = compact(b.y, ngy, gy, box[1], 1)
        uz = b.z * (gz / box[2])
        tz = uz[..., None] - jnp.arange(gz, dtype=dtype)
        tz = tz - gz * jnp.floor(tz / gz)
        wzd = bspline(tz, order)
        return jnp.sum(wlxt) + jnp.sum(wlyt) + jnp.sum(wzd)

    def grad_loop(f, k1=2, k2=52):
        @partial(jax.jit, static_argnums=(1,))
        def run(x0, k):
            def step(xx, _):
                e, g = jax.value_and_grad(f)(xx)
                return xx - 1e-12 * g, e
            xk, es = jax.lax.scan(step, x0, None, length=k)
            return es[-1] + 0.0 * jnp.sum(xk)
        return _timed_scan(run, x, k1, k2, reps=5)

    out = {}
    t_base = grad_loop(lambda xx: base_terms(xx)[0])
    out["base"] = round(t_base, 3)

    def f_weights(xx):
        e, b = base_terms(xx)
        return e + 1e-20 * weights_sum(b, xx.dtype)
    out["weights_marginal"] = round(grad_loop(f_weights) - t_base, 3)

    def f_spread_sg(xx):
        e, b = base_terms(xx)
        b_sg = jax.tree.map(jax.lax.stop_gradient, b)
        # charges still differentiable via q in blocks? b_sg freezes all —
        # keep q alive so the kernel backward still runs (d wrt q only):
        b_mix = b_sg._replace(q=b.q)
        return e + pme_cell_pallas_reciprocal_energy(b_mix, ids, system)
    out["recip_frozen_geometry_marginal"] = round(
        grad_loop(f_spread_sg) - t_base, 3)

    def f_recip(xx):
        e, b = base_terms(xx)
        return e + pme_cell_pallas_reciprocal_energy(b, ids, system)
    out["recip_full_marginal"] = round(grad_loop(f_recip) - t_base, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
