"""Diagnose the 9^3/10^3 grid cliff (BASELINE.md parked item).

Hypothesis: TPU tiles the last two dims to (8 sublanes, 128 lanes); block
and slab arrays are [gx, gy, gz, cap*] with gz on the SUBLANE dim, so
gz = 9/10 pads to 16 (+78%/+60% on every block elementwise op and roll)
while gz = 8 is exact.  This compiles the fused walk at several grids and
prints (a) compiled peak/temp memory from memory_analysis() — padding
shows up directly — and (b) the measured per-step walk time.

Usage: python tools/grid_cliff.py   (TPU; ~5 min of compiles per grid)
"""

import json
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan  # noqa: E402
from chargeflux_tpu import cells  # noqa: E402
from chargeflux_tpu.charges import effective_charges  # noqa: E402
from chargeflux_tpu.models import water_box  # noqa: E402
from chargeflux_tpu.neighbors import build_neighbor_state  # noqa: E402


def main():
    # ~30k atoms; force different cell grids by varying the cutoff around
    # the same box (grid = floor(box / (1.05 rc)))
    results = []
    for rc, label in ((0.8, "8^3"), (0.72, "9^3"), (0.65, "10^3")):
        force, pos, _, box = water_box(n_side=22, flux="bond_angle",
                                       cutoff=rc)
        system = force.create_system(box=box, dtype=jnp.float32,
                                     direct_method="cell")
        spec = system.spec
        x = jnp.asarray(pos, jnp.float32)
        nb = build_neighbor_state(x, system)
        q = effective_charges(x, system)
        blocks = cells.blockify(x, q, system, nb.slots, nb.inv_slot,
                                wrap=nb.wrap)
        ids = nb.slots.reshape(spec.cell_grid + (spec.cell_capacity,))

        def once(carry):
            b = cells.CellBlocks(x=carry[0], y=carry[1], z=carry[2],
                                 q=carry[3], hs=blocks.hs, se=blocks.se)
            return cells.direct_energy_on_blocks(b, ids, system), carry

        def e_of(carry):
            e, _ = once(carry)
            return e

        @partial(jax.jit, static_argnums=(1,))
        def run(c0, k):
            def step(c, _):
                e, g = jax.value_and_grad(e_of)(c)
                return [a - 1e-22 * da for a, da in zip(c, g)], e
            ck, es = jax.lax.scan(step, c0, None, length=k)
            return es[-1] + 0.0 * sum(jnp.sum(a) for a in ck)

        c0 = [blocks.x, blocks.y, blocks.z, blocks.q]
        lowered = run.lower(c0, 12)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        ms = _timed_scan(run, c0, 2, 12, reps=5)
        row = {
            "grid": spec.cell_grid, "cap": spec.cell_capacity, "rc": rc,
            "walk_ms": round(ms, 4),
            "temp_MB": round(getattr(mem, "temp_size_in_bytes", 0) / 2**20, 1),
            "peak_MB": round((getattr(mem, "temp_size_in_bytes", 0)
                              + getattr(mem, "argument_size_in_bytes", 0))
                             / 2**20, 1),
        }
        results.append(row)
        print(json.dumps(row))
    # padding hypothesis: temp_MB at 9^3/10^3 >> (slot ratio) x 8^3
    base = results[0]
    for r in results[1:]:
        slots = (np.prod(r["grid"]) * r["cap"] ** 2 * 14
                 / (np.prod(base["grid"]) * base["cap"] ** 2 * 14))
        print(json.dumps({"grid": r["grid"],
                          "slot_ratio_vs_8^3": round(float(slots), 3),
                          "temp_ratio": round(r["temp_MB"]
                                              / max(base["temp_MB"], 1e-9),
                                              3)}))


if __name__ == "__main__":
    main()
