"""A/B the rigid-water bench config: cutoff/skin trade x projection.

The rigid bench runs dt = 2 fs, and the rc 0.8 / 8^3-grid config's
0.06 nm skin forces rebuild_every=1 — the full ~1.2 ms binning is paid
EVERY step (r4 bench log).  With Ewald the cutoff is a *splitting* knob,
not a model knob: rc 0.72 at the same ewald_tol re-derives alpha and the
PME mesh, so forces keep the same accuracy contract.  Forcing the cell
grid to stay 8^3 (a reduction from the natural 9: allowed — wider cells
keep coverage) keeps the walk program IDENTICAL (same slots, same
capacity) while the skin triples (0.146 nm) and the binning amortizes
over the longer rebuild interval.  Also crosses the projection method
(constraints.RIGID_PROJECTION: newton vs settle).

Usage: python tools/rigid_rc_ab.py [reps] [case ...]
cases: rc08 rc072g8 (x newton/settle via method suffix, e.g.
rc072g8:settle); default sweep measures all four.
"""

import json
import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")
from bench import _timed_scan, wait_for_backend  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import chargeflux_tpu.constraints as constraints  # noqa: E402

CASES = {
    "rc08": dict(cutoff=0.8, cell_grid=None),
    "rc072g8": dict(cutoff=0.72, cell_grid=(8, 8, 8)),
}


def build_case(cutoff, cell_grid):
    from chargeflux_tpu.cells import suggest_capacity
    from chargeflux_tpu.models import rigid_water_box

    force, pos, masses, box, params = rigid_water_box(
        n_side=22, cutoff=cutoff, dtype=jnp.float32)
    kw = dict(box=box, dtype=jnp.float32, direct_method="cell")
    if cell_grid is not None:
        kw["cell_grid"] = cell_grid
    system = force.create_system(**kw)
    cap = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.1)
    if cap != system.spec.cell_capacity:
        system = force.create_system(cell_capacity=cap, **kw)
    return force, pos, masses, box, params, system, kw


def relax(system, force, pos, masses, params, kw):
    from chargeflux_tpu.cells import suggest_capacity
    from chargeflux_tpu.constraints import rattle_langevin_trajectory_nb
    from chargeflux_tpu.integrate import (init_state_nb, make_nb_energy_fn,
                                          maxwell_velocities)
    from chargeflux_tpu.neighbors import suggest_rebuild_interval
    from chargeflux_tpu.utils import max_cell_occupancy

    dt = 2e-3
    x = jnp.asarray(pos, jnp.float32)
    m = jnp.asarray(np.asarray(masses), jnp.float32)
    cap_burn = suggest_capacity(pos, np.asarray(jax.device_get(system.box)),
                                system.spec.cell_grid, margin=1.35)
    burn_sys = (force.create_system(cell_capacity=cap_burn, **kw)
                if cap_burn > system.spec.cell_capacity else system)
    e_fn_b, init_nb_b = make_nb_energy_fn(burn_sys)
    rebuild_hot = suggest_rebuild_interval(burn_sys, dt, max_speed=12.0,
                                           cap=10)
    v0 = maxwell_velocities(m, 300.0, jax.random.PRNGKey(0),
                            dtype=jnp.float32)
    s0 = init_state_nb(x, v0, e_fn_b, init_nb_b)
    s_eq, kes0 = rattle_langevin_trajectory_nb(
        s0, e_fn_b, init_nb_b, m, dt=dt, temperature=300.0, friction=20.0,
        key=jax.random.PRNGKey(1), n_steps=200 * rebuild_hot,
        rebuild_every=rebuild_hot, params=params)
    assert np.all(np.isfinite(np.asarray(kes0))), "burn-in NaN"
    occ_eq = max_cell_occupancy(s_eq.positions, system)
    cap_eq = -(-int(np.ceil(occ_eq * 1.10)) // 8) * 8
    if cap_eq > system.spec.cell_capacity:
        system = force.create_system(cell_capacity=cap_eq, **kw)
    vmax = float(np.max(np.linalg.norm(
        np.asarray(jax.device_get(s_eq.velocities)), axis=-1)))
    rebuild_every = suggest_rebuild_interval(
        system, dt, max_speed=max(4.0, 1.2 * vmax), cap=40)
    return system, s_eq, m, rebuild_every, vmax


def main():
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 2
    case_args = [a for a in args if not a.isdigit()]
    legs = []
    for a in (case_args or ["rc08:newton", "rc072g8:newton",
                            "rc072g8:settle", "rc08:settle"]):
        case, _, method = a.partition(":")
        legs.append((case, method or "newton"))
    wait_for_backend()

    from chargeflux_tpu.constraints import rattle_langevin_trajectory_nb
    from chargeflux_tpu.integrate import init_state_nb, make_nb_energy_fn

    dt = 2e-3
    setups = {}
    for case in {c for c, _m in legs}:
        cfg = CASES[case]
        force, pos, masses, box, params, system, kw = build_case(**cfg)
        system, s_eq, m, rebuild_every, vmax = relax(
            system, force, pos, masses, params, kw)
        e_fn, init_nb = make_nb_energy_fn(system)
        s1 = init_state_nb(s_eq.positions, s_eq.velocities, e_fn, init_nb)
        setups[case] = (system, s1, e_fn, init_nb, m, params, rebuild_every)
        print(f"# {case}: grid={system.spec.cell_grid} "
              f"cap={system.spec.cell_capacity} pme={system.spec.pme_grid} "
              f"rebuild_every={rebuild_every} vmax={vmax:.2f}", flush=True)

    acc = {}
    for _ in range(reps):
        for case, method in legs:
            system, s1, e_fn, init_nb, m, params, rebuild_every = \
                setups[case]
            constraints.RIGID_PROJECTION = method

            def chunk(k):
                _s, kes = rattle_langevin_trajectory_nb(
                    s1, e_fn, init_nb, m, dt=dt, temperature=300.0,
                    friction=5.0, key=jax.random.PRNGKey(2),
                    n_steps=k * rebuild_every,
                    rebuild_every=rebuild_every, params=params)
                return kes[-1]

            @partial(jax.jit, static_argnums=(1,))
            def run(_p, k):
                return chunk(k)

            k1 = max(1, 10 // rebuild_every)
            ms = _timed_scan(run, 0, k1, 6 * k1, reps=7) / rebuild_every
            ke = float(run(0, k1))
            assert np.isfinite(ke), (case, method)
            acc.setdefault((case, method), []).append(ms)
            print(json.dumps({"case": case, "method": method,
                              "ms_per_rigid_step": round(ms, 4)}),
                  flush=True)
    for (case, method), vals in acc.items():
        print(json.dumps({"case": case, "method": method,
                          "median_ms": round(float(np.median(vals)), 4),
                          "all": [round(v, 3) for v in vals]}), flush=True)


if __name__ == "__main__":
    main()
