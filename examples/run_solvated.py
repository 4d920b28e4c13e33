"""Solvated-solute MD: a bonded chain "mini-protein" in flux water.

Heterogeneous-topology end-to-end drive (models.solvated_chain_box): the
chain's flux bonds / exclusions / bonded terms run on the general scatter
path, the waters on the molecule-template fast path — the split
topology.detect_templates makes automatically (the reference API is
topology-agnostic, CoulForce.h:137-149).

    python examples/run_solvated.py [n_side] [n_solute_sites] [n_steps] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import chargeflux_tpu as cf
from chargeflux_tpu.bonded import BondedParams
from chargeflux_tpu.integrate import (
    init_state_nb, make_nb_energy_fn, maxwell_velocities,
    nve_trajectory_nb)
from chargeflux_tpu.models import solvated_chain_box
from chargeflux_tpu.neighbors import suggest_rebuild_interval


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_sites = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    dt = 5e-5  # ps

    force, pos, masses, box, bonded_kw = solvated_chain_box(
        n_side=n_side, n_solute_sites=n_sites, cutoff=0.6)
    system = force.create_system(box=box, dtype=jnp.float32)
    bonded = BondedParams.create(box=box, pbc=True, dtype=jnp.float32,
                                 **bonded_kw)
    ts = system.spec.flux_template
    print(f"{system.n_atoms} atoms: {3 * n_sites}-bead chain (scatter "
          f"remainder) + {ts.templates[0].count if ts else 0} templated "
          f"waters")

    if system.spec.direct_method == "cell":
        from chargeflux_tpu.cells import suggest_capacity
        cap = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.25)
        if cap > system.spec.cell_capacity:
            system = force.create_system(box=box, dtype=jnp.float32,
                                         cell_capacity=cap)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    m = jnp.asarray(np.asarray(masses), jnp.float32)
    v0 = maxwell_velocities(m, 100.0, jax.random.PRNGKey(0),
                            dtype=jnp.float32)
    state = init_state_nb(jnp.asarray(pos, jnp.float32), v0, e_fn, init_nb)
    re = (suggest_rebuild_interval(system, dt)
          if system.spec.direct_method == "cell" else n_steps)
    n_run = -(-n_steps // re) * re

    t0 = time.perf_counter()
    final, etots = nve_trajectory_nb(state, e_fn, init_nb, m, dt, n_run,
                                     rebuild_every=re)
    etots = np.asarray(etots)
    elapsed = time.perf_counter() - t0
    assert np.all(np.isfinite(etots)), "trajectory NaN-poisoned"
    print(f"{n_run} steps in {elapsed:.2f} s "
          f"({elapsed / n_run * 1e3:.3f} ms/step incl. compile)")
    print(f"max |E - E0| = {float(np.max(np.abs(etots - etots[0]))):.4f} "
          f"kJ/mol")


if __name__ == "__main__":
    main()
