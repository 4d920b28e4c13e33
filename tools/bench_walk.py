"""TPU micro-bench: Mosaic walk kernel versions vs the XLA roll walk.

Usage: python tools/bench_walk.py [n_side]   (default 22 = the 30k box)
Times K iterations of the bare fused walk (fwd only; the custom_vjp
backward is a scale) inside one lax.scan, scan-differenced per CLAUDE.md.
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from chargeflux_tpu import cells
from chargeflux_tpu.charges import effective_charges
from chargeflux_tpu.models import water_box
from chargeflux_tpu.ops.pallas_walk import mosaic_fused_walk


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    force, pos, _, box = water_box(n_side=n_side, flux="bond_angle")
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell")
    from chargeflux_tpu.cells import suggest_capacity
    cap = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.05)
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
    print(f"atoms={system.n_atoms} grid={spec.cell_grid} cap={cap}",
          file=sys.stderr)

    def timed(walk_fn, label):
        @partial(jax.jit, static_argnums=(1,))
        def run(b, k):
            def body(bb, _):
                e, g, dq = walk_fn(bb, ids, system)
                bb = bb._replace(x=bb.x + 1e-12 * g[0])
                return bb, e
            bk, es = jax.lax.scan(body, b, None, length=k)
            return es[-1] + 0.0 * jnp.sum(bk.x)

        e1 = float(run(blocks, 2))
        float(run(blocks, 12))

        def t(k):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(run(blocks, k))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        ms = (t(12) - t(2)) / 10 * 1e3
        print(f"{label}: {ms:.3f} ms  (e={e1:.1f})")
        return ms, e1

    results = {}
    results["mosaic"] = timed(mosaic_fused_walk, "mosaic")
    results["xla"] = timed(cells._roll_fused_walk, "xla roll")
    es = [v[1] for v in results.values()]
    rel = max(abs(e - es[-1]) for e in es) / abs(es[-1])
    print(f"energy cross-check rel spread: {rel:.2e}")


if __name__ == "__main__":
    main()
