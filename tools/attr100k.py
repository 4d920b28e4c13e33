"""100k attribution pass (VERDICT r3 item 4): the config hasn't moved
since round 2 (9.0-9.1 ms).  Same-process alternated full-MD-step A/B of
cell-grid variants at the 100k shapes, with per-phase in-context
marginals for the control:

  nat      natural grid (11^3 at rc 0.8) — the shipped config
  z8       (11, 11, 8): snap the sublane (gz) axis to 8
  g12z8    (12, 12, 8): 8-multiple-adjacent x/y too, and gx*gy = 144
           columns unlocks the cb=4 spread column batch (121 is prime^2)

Usage: python tools/attr100k.py [reps] [case ...]
"""

import json
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_full, measure_md_step, measure_phases, \
    wait_for_backend  # noqa: E402
from chargeflux_tpu.cells import suggest_capacity  # noqa: E402
from chargeflux_tpu.models import water_box  # noqa: E402


def build_grid(grid, cutoff=0.8, pme=None):
    force, pos, masses, box = water_box(n_side=32, flux="bond_angle",
                                        cutoff=cutoff)
    kw = {} if grid is None else {"cell_grid": tuple(grid)}
    if pme is not None:
        kw["pme_grid"] = tuple(pme)
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell", **kw)
    cap = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.05)
    if cap != system.spec.cell_capacity:
        system = force.create_system(box=box, dtype=jnp.float32,
                                     direct_method="cell",
                                     cell_capacity=cap, **kw)
    return (jnp.asarray(pos, jnp.float32), system,
            jnp.asarray(np.asarray(masses), jnp.float32), force)


# case -> (cell_grid, cutoff, pme_grid).  The g16rc06 family is the
# round-4 all-8-multiple lever: the grid cliff follows ANY non-8-multiple
# axis (tools/cutoff_scan.py gz8 scan), and 100k ships on 11^3 — but at
# rc 0.6 a 16^3 grid fits (width 0.621 >= rc), every axis is a multiple
# of 8, cap drops 96 -> ~32-48 and padded walk slots fall ~3x (4096
# cells x cap^2 vs 1331 x 96^2).  The p112 variant pins the PME mesh to
# 112 = 16 x 7 so the cell-blocked spread's patch windows stay tight
# (108 = natural is NOT divisible by 16 — the g12z8 failure mode).
GRIDS = {"nat": (None, 0.8, None),
         "z8": ((11, 11, 8), 0.8, None),
         "g12z8": ((12, 12, 8), 0.8, None),
         "g16rc06": ((16, 16, 16), 0.6, None),
         "g16rc06p112": ((16, 16, 16), 0.6, (112, 112, 112)),
         # rc < cell width puts the splitting knob to work INSIDE the
         # 16^3 grid (rc 0.6 leaves only 0.021 nm skin -> rebuild ~2):
         "g16rc058p128": ((16, 16, 16), 0.58, (128, 128, 128)),
         "g16rc055p128": ((16, 16, 16), 0.55, (128, 128, 128))}


def main():
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 2
    names = [a for a in args if not a.isdigit()] or list(GRIDS)
    wait_for_backend()
    cases = {}
    for name in names:
        if name == "nat":
            x, system, masses, force = build_full("100k")
        else:
            x, system, masses, force = build_grid(*GRIDS[name])
        cases[name] = (x, system, masses, force)
        print(json.dumps({"case": name,
                          "grid": list(system.spec.cell_grid),
                          "cap": system.spec.cell_capacity,
                          "walk_chunks": system.spec.walk_chunks,
                          "pme": list(system.spec.pme_grid)}), flush=True)

    acc = {}
    for r in range(reps):
        for name, (x, system, masses, force) in cases.items():
            try:
                ms, e, sys_out = measure_md_step(x, system, masses,
                                                 force=force)
                assert np.isfinite(e), name
            except Exception as exc:   # a variant must not sink the A/B
                print(json.dumps({"case": name,
                                  "error": str(exc)[:200]}), flush=True)
                continue
            rec = {"case": name, "ms_per_md_step": round(ms, 4),
                   "cap": sys_out.spec.cell_capacity}
            if r == 0:
                rec["phases_ms"] = measure_phases(x, sys_out)
            acc.setdefault(name, []).append(ms)
            print(json.dumps(rec), flush=True)
    for name, vals in acc.items():
        print(json.dumps({"case": name,
                          "median_ms": round(float(np.median(vals)), 4),
                          "all": [round(v, 3) for v in vals]}), flush=True)


if __name__ == "__main__":
    main()
