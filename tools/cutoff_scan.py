"""A/B scan of the Ewald direct-space cutoff at the 30k bench config.

The total Ewald Coulomb interaction is cutoff-independent up to the error
tolerance: shrinking the real-space cutoff raises alpha and pushes work
from the O(N*cap^2) direct walk onto the O(N log N) PME mesh (whose spread
cost is ~cutoff-independent and whose FFT is nearly free on TPU).  The
direct walk's slot count scales ~ cutoff^3 at fixed occupancy margin, so
there is a TPU-optimal split well below the reference's 0.9-1.0 nm
defaults.  This tool measures the full MD step at several cutoffs to find
it (LJ truncation is a model parameter that moves with the cutoff, exactly
as in the reference, where `cutoff` is one user knob for both terms:
CoulForce.cpp:44-46).

Usage: python tools/cutoff_scan.py [rc | rc:layout ...]   (default below)
Each entry is a cutoff in nm, optionally suffixed with the pair-tile
layout, e.g. ``0.7:concat`` (default layout "shift"; see
StaticSpec.walk_layout — "concat" amortizes the 128-lane j padding and is
what makes sub-0.9 cutoffs competitive).
"""

import json
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import measure_md_step  # noqa: E402
from chargeflux_tpu.cells import suggest_capacity  # noqa: E402
from chargeflux_tpu.models import water_box  # noqa: E402


def build(cutoff: float, layout: str = "shift", gz8: bool = False,
          grid=None, cap_override=None):
    force, pos, masses, box = water_box(n_side=22, flux="bond_angle",
                                        cutoff=cutoff)
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell", walk_layout=layout)
    kw = {}
    if gz8:
        # snap gz DOWN to a multiple of 8 (the sublane dim of every
        # block/slab array; gz=9/10 measured a ~2x in-context walk cliff)
        gx, gy, gz = system.spec.cell_grid
        kw["cell_grid"] = (gx, gy, max((gz // 8) * 8, 3))
    if grid is not None:
        # explicit grid override (skin/interval trade A/B: a coarser grid
        # buys Verlet skin and rebuild-interval amortization at the cost
        # of more padded walk slots)
        kw["cell_grid"] = tuple(grid)
    if kw:
        system = force.create_system(box=box, dtype=jnp.float32,
                                     direct_method="cell",
                                     walk_layout=layout, **kw)
    cap = (cap_override if cap_override is not None else
           suggest_capacity(pos, box, system.spec.cell_grid, margin=1.05))
    if cap != system.spec.cell_capacity:
        system = force.create_system(box=box, dtype=jnp.float32,
                                     direct_method="cell", cell_capacity=cap,
                                     walk_layout=layout, **kw)
    return (jnp.asarray(pos, jnp.float32), system,
            jnp.asarray(np.asarray(masses), jnp.float32))


def main():
    entries = sys.argv[1:] or ["0.9", "0.7", "0.65", "0.6", "0.55"]
    for ent in entries:
        parts = ent.split(":")
        rc = float(parts[0])
        layout = parts[1] if len(parts) > 1 and parts[1] else "shift"
        gz8 = "gz8" in parts[2:]
        grid = cap_override = None
        for tok in parts[2:]:
            if tok.startswith("g") and tok != "gz8":
                g = tok[1:].split("x")
                grid = ([int(g[0])] * 3 if len(g) == 1
                        else [int(v) for v in g])
            elif tok.startswith("cap"):
                cap_override = int(tok[3:])
        x, system, masses = build(rc, layout, gz8, grid, cap_override)
        spec = system.spec
        ms, e_check, _ = measure_md_step(x, system, masses)
        from bench import measure_phases
        print(json.dumps({
            "cutoff": rc,
            "layout": layout,
            "ms_per_md_step": round(ms, 4),
            "grid": list(spec.cell_grid),
            "cap": spec.cell_capacity,
            "pme": list(spec.pme_grid),
            "alpha": round(float(spec.alpha), 4),
            "energy": round(float(e_check), 3),
            "finite": bool(np.isfinite(e_check)),
            "phases_ms": measure_phases(x, system),
        }), flush=True)


if __name__ == "__main__":
    main()
