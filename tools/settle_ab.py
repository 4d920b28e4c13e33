"""A/B the rigid-water position projection: Newton RATTLE vs SETTLE.

Both solve the same SHAKE equations (settle is the closed-form
Miyamoto-Kollman solution; f64 parity pinned in tests), so this is a
pure speed choice (constraints.RIGID_PROJECTION).  Measures the rigid
bench configuration (30k rigid TIP3P, dt 2 fs, RATTLE BAOAB with
neighbor reuse) same-process alternated per house methodology.

Usage: python tools/settle_ab.py [reps] [method ...]
"""

import json
import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")
from bench import _timed_scan, _with_capacity, wait_for_backend  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import chargeflux_tpu.constraints as constraints  # noqa: E402


def main():
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 2
    methods = [a for a in args if not a.isdigit()] or ["newton", "settle"]
    wait_for_backend()

    from chargeflux_tpu.cells import suggest_capacity
    from chargeflux_tpu.constraints import rattle_langevin_trajectory_nb
    from chargeflux_tpu.integrate import (init_state_nb, make_nb_energy_fn,
                                          maxwell_velocities)
    from chargeflux_tpu.models import rigid_water_box
    from chargeflux_tpu.neighbors import suggest_rebuild_interval
    from chargeflux_tpu.utils import max_cell_occupancy

    dt = 2e-3
    force, pos, masses, box, params = rigid_water_box(n_side=22, cutoff=0.8,
                                                      dtype=jnp.float32)
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell")
    cap = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.1)
    if cap != system.spec.cell_capacity:
        system = force.create_system(box=box, dtype=jnp.float32,
                                     direct_method="cell", cell_capacity=cap)
    x = jnp.asarray(pos, jnp.float32)
    m = jnp.asarray(np.asarray(masses), jnp.float32)
    cap_burn = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.35)
    burn_sys = (_with_capacity(force, system, cap_burn)
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
        system = _with_capacity(force, system, cap_eq)
    e_fn, init_nb = make_nb_energy_fn(system)
    vmax = float(np.max(np.linalg.norm(
        np.asarray(jax.device_get(s_eq.velocities)), axis=-1)))
    rebuild_every = suggest_rebuild_interval(
        system, dt, max_speed=max(4.0, 1.2 * vmax), cap=40)
    s_eq = init_state_nb(s_eq.positions, s_eq.velocities, e_fn, init_nb)
    print(f"# rigid setup: rebuild_every={rebuild_every} "
          f"cap={system.spec.cell_capacity} vmax={vmax:.2f}", flush=True)

    def make_run():
        def chunk(k):
            _s, kes = rattle_langevin_trajectory_nb(
                s_eq, e_fn, init_nb, m, dt=dt, temperature=300.0,
                friction=5.0, key=jax.random.PRNGKey(2),
                n_steps=k * rebuild_every, rebuild_every=rebuild_every,
                params=params)
            return kes[-1]

        @partial(jax.jit, static_argnums=(1,))
        def run(_p, k):
            return chunk(k)
        return run

    k1 = max(1, 10 // rebuild_every)
    acc = {}
    for _ in range(reps):
        for method in methods:
            constraints.RIGID_PROJECTION = method
            run = make_run()
            ms = _timed_scan(run, 0, k1, 6 * k1, reps=7) / rebuild_every
            ke = float(run(0, k1))
            assert np.isfinite(ke), method
            acc.setdefault(method, []).append(ms)
            print(json.dumps({"method": method,
                              "ms_per_rigid_step": round(ms, 4)}),
                  flush=True)
    for method, vals in acc.items():
        print(json.dumps({"method": method,
                          "median_ms": round(float(np.median(vals)), 4),
                          "all": [round(v, 3) for v in vals]}), flush=True)


if __name__ == "__main__":
    main()
