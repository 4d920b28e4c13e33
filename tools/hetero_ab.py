"""Attribute the hetero30k overhead (measured 3.50 vs 2.93 ms pure water).

Same-process alternated full-MD-step A/B across solute sizes:
  water     pure 30k box (reference)
  s8        24-bead chain  (offset 24, 8-aligned)
  s100      300-bead chain (offset 300, NOT 8-row-aligned)
  s104      312-bead chain (offset 312, 8-aligned)

If s104 ~= water while s100 is slow, the cost is the template block's
unaligned row offset (sublane relayouts on every q/exclusion/bonded
segment slice); if all chain legs are slow, it's the extra
template+remainder program structure itself.

Usage: python tools/hetero_ab.py [reps]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import DT_PS, build_full, measure_md_step, wait_for_backend  # noqa: E402


def build_case(n_sites):
    from chargeflux_tpu.bonded import BondedParams
    from chargeflux_tpu.cells import suggest_capacity
    from chargeflux_tpu.models import solvated_chain_box

    force, pos, masses, box, bonded_kw = solvated_chain_box(
        n_side=22, n_solute_sites=n_sites, cutoff=0.8)
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell")
    cap = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.05)
    if cap != system.spec.cell_capacity:
        system = force.create_system(box=box, dtype=jnp.float32,
                                     direct_method="cell",
                                     cell_capacity=cap)
    bonded = BondedParams.create(box=box, pbc=True, dtype=jnp.float32,
                                 **bonded_kw)
    return (jnp.asarray(pos, jnp.float32), system,
            jnp.asarray(np.asarray(masses), jnp.float32), force, bonded)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    wait_for_backend()
    cases = {}
    x, system, masses, force = build_full("30k")
    cases["water"] = (x, system, masses, force, None)
    for n_sites in (8, 100, 104):
        cases[f"s{n_sites}"] = build_case(n_sites)

    acc = {k: [] for k in cases}
    for _ in range(reps):
        for name, (x, system, masses, force, bonded) in cases.items():
            ms, e, sys_out = measure_md_step(x, system, masses, force=force,
                                             bonded=bonded)
            assert np.isfinite(e), name
            acc[name].append(ms)
            print(json.dumps({"case": name,
                              "ms_per_md_step": round(ms, 4),
                              "cell_capacity": sys_out.spec.cell_capacity}),
                  flush=True)
    for name in cases:
        print(json.dumps({"case": name,
                          "median_ms": round(float(np.median(acc[name])), 4),
                          "all": [round(v, 3) for v in acc[name]]}),
              flush=True)


if __name__ == "__main__":
    main()
