"""Full-MD-step A/B of the walk_layout variants at the bench 30k config.

Same methodology as bench.measure_md_step (packed carry, nb reuse,
paired scan differences), alternating layouts in ONE process so tunnel /
thermal drift cancels (BASELINE.md measurement rules).

Usage: python tools/layout_ab.py [30k|4k|100k] [reps]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import DT_PS, measure_md_step, wait_for_backend  # noqa: E402
from chargeflux_tpu.cells import suggest_capacity  # noqa: E402
from chargeflux_tpu.models import water_box  # noqa: E402

LAYOUTS = ("concat", "concat_hyb", "concat_mxu")


def build_layout(config, layout):
    n_side = {"4k": 11, "30k": 22, "100k": 32}[config]
    force, pos, masses, box = water_box(n_side=n_side, flux="bond_angle",
                                        cutoff=0.8)
    kw = dict(box=box, dtype=jnp.float32, direct_method="cell",
              walk_layout=layout)
    system = force.create_system(**kw)
    cap = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.05)
    if cap != system.spec.cell_capacity:
        system = force.create_system(cell_capacity=cap, **kw)
    return (jnp.asarray(pos, jnp.float32), system,
            jnp.asarray(np.asarray(masses), jnp.float32))


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "30k"
    outer_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    wait_for_backend()
    built = {lo: build_layout(config, lo) for lo in LAYOUTS}
    # alternate layouts across outer reps: drift hits all variants equally
    acc = {lo: [] for lo in LAYOUTS}
    for _ in range(outer_reps):
        for lo in LAYOUTS:
            x, system, masses = built[lo]
            ms, e = measure_md_step(x, system, masses)
            assert np.isfinite(e), lo
            acc[lo].append(ms)
            print(json.dumps({"layout": lo, "config": config,
                              "ms_per_md_step": round(ms, 4)}))
    for lo in LAYOUTS:
        print(json.dumps({"layout": lo, "config": config,
                          "median_ms": round(float(np.median(acc[lo])), 4),
                          "all": [round(v, 3) for v in acc[lo]]}))


if __name__ == "__main__":
    main()
