"""TPU micro-bench: decompose the cell-blocked PME reciprocal fwd+grad.

Usage: python tools/bench_recip.py [n_side]
Pieces: full recip fwd / fwd+grad on prebuilt blocks, the compact weight
tensors alone, the Pallas spread alone, FFT+influence alone.
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from chargeflux_tpu import cells, pme
from chargeflux_tpu.charges import effective_charges
from chargeflux_tpu.models import water_box


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    force, pos, _, box = water_box(n_side=n_side, flux="bond_angle")
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell")
    cap = cells.suggest_capacity(pos, box, system.spec.cell_grid, margin=1.05)
    if cap != system.spec.cell_capacity:
        system = force.create_system(box=box, dtype=jnp.float32,
                                     direct_method="cell", cell_capacity=cap)
    spec = system.spec
    x = jnp.asarray(pos, jnp.float32)
    q = effective_charges(x, system)
    slots, inv, _ = cells.build_cell_list_full(x, system.box, spec.cell_grid,
                                               spec.cell_capacity)
    blocks = cells.blockify(x, q, system, slots, inv)
    ids = slots.reshape(blocks.x.shape)
    print(f"atoms={system.n_atoms} grid={spec.cell_grid} cap={cap} "
          f"pme={spec.pme_grid} order={spec.pme_order}", file=sys.stderr)

    def timed(fn, label, grad=False):
        # feed back into EVERY field the op consumes: a loop that updates
        # only x lets XLA hoist all y/z/q-dependent work out of the scan
        # and under-measure (see BASELINE.md methodology caveat)
        if grad:
            g = jax.value_and_grad(fn)

            def step(b):
                e, gb = g(b)
                return b._replace(x=b.x + 1e-12 * gb.x,
                                  y=b.y + 1e-12 * gb.y,
                                  z=b.z + 1e-12 * gb.z,
                                  q=b.q + 1e-15 * gb.q), e
        else:
            def step(b):
                e = fn(b)
                t = 1e-15 * e
                return b._replace(x=b.x + t, y=b.y + t, z=b.z + t,
                                  q=b.q + t), e

        @partial(jax.jit, static_argnums=(1,))
        def run(b, k):
            bk, es = jax.lax.scan(lambda bb, _: step(bb), b, None, length=k)
            return es[-1] + 0.0 * jnp.sum(bk.x)

        # warm to steady state, then per-rep paired differences (block-wise
        # medians drift-bias the result — same recipe as bench._timed_scan)
        float(run(blocks, 2))
        t_end = time.perf_counter() + 10.0
        while time.perf_counter() < t_end:
            float(run(blocks, 52))

        def t(k):
            t0 = time.perf_counter()
            float(run(blocks, k))
            return time.perf_counter() - t0

        ds = [t(52) - t(2) for _ in range(5)]
        ms = float(np.median(ds)) / 50 * 1e3
        print(f"{label}: {ms:.3f} ms")
        return ms

    use_pallas = pme._pallas_spread_ok(spec, jnp.float32)
    recip = (pme.pme_cell_pallas_reciprocal_energy if use_pallas
             else pme.pme_cell_reciprocal_energy)
    print(f"pallas spread: {use_pallas}")
    timed(lambda b: recip(b, ids, system), "recip fwd", grad=False)
    timed(lambda b: recip(b, ids, system), "recip fwd+grad", grad=True)

    # weights alone: same bspline tensors the pallas path builds
    order = spec.pme_order
    ngx, ngy, ngz = spec.cell_grid
    gx, gy, gz = spec.pme_grid

    def weights_only(b):
        def cw(coord, n_cells, grid_n, length, cell_axis):
            extra = spec.pme_slack[cell_axis]
            u = coord * (grid_n / length)
            org = pme._patch_origins(n_cells, grid_n, order, extra)
            w = pme._patch_width(n_cells, grid_n, order, extra)
            shape = [1, 1, 1, 1, 1]
            shape[cell_axis] = n_cells
            base = jnp.asarray(org, jnp.float32).reshape(shape)
            j = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w, 1, 1)
            t = u[:, :, None, :, :] - (base + j)
            return pme.bspline(t, order)

        wlxt = cw(b.x, ngx, gx, system.box[0], 0)
        wlyt = cw(b.y, ngy, gy, system.box[1], 1)
        uz = b.z * (gz / system.box[2])
        tz = uz[..., None] - jnp.arange(gz, dtype=jnp.float32)
        tz = tz - gz * jnp.floor(tz / gz)
        wzd = pme.bspline(tz, order)
        return (jnp.sum(wlxt * wlxt) + jnp.sum(wlyt * wlyt)
                + jnp.sum(wzd * wzd))

    timed(weights_only, "weights fwd", grad=False)
    timed(weights_only, "weights fwd+grad", grad=True)

    # FFT + influence alone
    d = pme.influence_function(spec.pme_grid, system.box, spec.alpha, order,
                               jnp.float32)

    def fftpart(b):
        qg = jnp.zeros(spec.pme_grid, jnp.float32).at[0, 0, 0].set(
            jnp.sum(b.q) + b.x[0, 0, 0, 0])
        qh = jnp.fft.rfftn(qg)
        return jnp.sum(d * (qh.real ** 2 + qh.imag ** 2))

    timed(fftpart, "fft+influence fwd+grad", grad=True)


if __name__ == "__main__":
    main()
