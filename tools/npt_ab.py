"""Same-process alternated A/B: NPT (Langevin + MC barostat) vs NVE at
the 30k headline config, with barostat acceptance rate and volume drift.

VERDICT r4 item 7: the NPT bench leg was a single fresh reading (3.203
ms) with no control and no acceptance statistics — a draw, not a number,
by house rules.  This tool equilibrates ONE state, then alternates timed
NVE and NPT windows over it in the same process, and separately runs a
diagnostic NPT stretch to report the MC acceptance rate (target ~50%,
the adaptive proposal width's setpoint, npt.py:26-29) and the mean
volume drift.

Usage: python tools/npt_ab.py [reps]
"""

import json
import math
import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import (DT_PS, _timed_scan, _with_capacity, build_full,  # noqa: E402
                   wait_for_backend)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    wait_for_backend()
    from chargeflux_tpu.cells import suggest_capacity
    from chargeflux_tpu.integrate import (init_state_nb,
                                          langevin_trajectory_nb,
                                          make_nb_energy_fn,
                                          make_packed_nve_chunk)
    from chargeflux_tpu.models import water_bonded_params
    from chargeflux_tpu.neighbors import suggest_rebuild_interval
    from chargeflux_tpu.npt import npt_langevin_trajectory
    from chargeflux_tpu.utils import max_cell_occupancy

    x, system, masses, force = build_full("30k")
    box0 = np.asarray(jax.device_get(system.box))
    bonded = water_bonded_params(system.n_atoms // 3, box=box0,
                                 dtype=jnp.float32)
    m = jnp.asarray(np.asarray(masses), jnp.float32)

    # one shared burn-in (bench_npt's recipe)
    cap_burn = suggest_capacity(np.asarray(x), box0,
                                system.spec.cell_grid, margin=1.35)
    burn_sys = (_with_capacity(force, system, cap_burn)
                if cap_burn > system.spec.cell_capacity else system)
    e_fn_b, init_nb_b = make_nb_energy_fn(burn_sys, bonded=bonded)
    re_burn = suggest_rebuild_interval(burn_sys, DT_PS, max_speed=24.0,
                                      cap=10)
    s0 = init_state_nb(x, jnp.zeros_like(x), e_fn_b, init_nb_b)
    n_burn = -(-400 // re_burn) * re_burn
    s_eq, kes = langevin_trajectory_nb(
        s0, e_fn_b, init_nb_b, m, dt=DT_PS, temperature=300.0,
        friction=20.0, key=jax.random.PRNGKey(1), n_steps=n_burn,
        rebuild_every=re_burn)
    assert np.all(np.isfinite(np.asarray(kes))), "burn-in NaN"

    occ_eq = max_cell_occupancy(s_eq.positions, system)
    cap_eq = -(-int(math.ceil(occ_eq * 1.10)) // 8) * 8
    if cap_eq > system.spec.cell_capacity:
        system = _with_capacity(force, system, cap_eq)
    vmax = float(np.max(np.linalg.norm(
        np.asarray(jax.device_get(s_eq.velocities)), axis=-1)))
    interval = suggest_rebuild_interval(
        system, DT_PS, max_speed=max(8.0, 1.2 * vmax), cap=40)
    print(f"# npt_ab: interval={interval} vmax={vmax:.2f} "
          f"cap={system.spec.cell_capacity}", file=sys.stderr)

    x_eq = jnp.asarray(s_eq.positions)
    v_eq = jnp.asarray(s_eq.velocities)

    # NVE runner (measure_md_step's inner form, same equilibrated state)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    pack, _unpack, outer = make_packed_nve_chunk(
        e_fn, init_nb, m, DT_PS, interval)
    p_eq = pack(init_state_nb(x_eq, v_eq, e_fn, init_nb))

    @partial(jax.jit, static_argnums=(1,))
    def run_nve(p, k):
        p_k, es = jax.lax.scan(outer, p, None, length=k)
        return es[-1, -1] + 0.0 * jnp.sum(p_k)

    @partial(jax.jit, static_argnums=(1,))
    def run_npt(_p, k):
        xf, vf, boxf, diag = npt_langevin_trajectory(
            x_eq, v_eq, system, m, dt=DT_PS, temperature=300.0,
            friction=5.0, pressure_bar=1.0, key=jax.random.PRNGKey(2),
            n_steps=k * interval, barostat_interval=interval,
            bonded=bonded)
        return diag["energies"][-1] + 0.0 * (jnp.sum(xf) + jnp.sum(boxf))

    k1 = max(1, 10 // interval)
    acc = {"nve": [], "npt": []}
    for _ in range(reps):
        ms = _timed_scan(run_nve, p_eq, k1, 6 * k1, reps=7) / interval
        acc["nve"].append(ms)
        print(json.dumps({"leg": "nve", "ms_per_step": round(ms, 4)}),
              flush=True)
        ms = _timed_scan(run_npt, 0, k1, 6 * k1, reps=7) / interval
        acc["npt"].append(ms)
        print(json.dumps({"leg": "npt", "ms_per_step": round(ms, 4)}),
              flush=True)

    # diagnostic stretch: acceptance + volume drift (outside timing)
    n_att = 40
    xf, vf, boxf, diag = npt_langevin_trajectory(
        x_eq, v_eq, system, m, dt=DT_PS, temperature=300.0,
        friction=5.0, pressure_bar=1.0, key=jax.random.PRNGKey(3),
        n_steps=n_att * interval, barostat_interval=interval,
        bonded=bonded)
    accepts = np.asarray(diag["accepts"], float).reshape(-1)
    boxes = np.asarray(diag["boxes"], float)
    vols = (np.prod(boxes, axis=-1) if boxes.ndim == 2
            else np.abs(np.linalg.det(boxes)))
    v0 = float(np.prod(box0)) if box0.ndim == 1 else float(
        np.abs(np.linalg.det(box0)))
    v_mean = float(np.mean(vols[len(vols) // 2:]))
    assert np.all(np.isfinite(np.asarray(diag["energies"]))), "NPT NaN"
    out = {"accept_rate": round(float(np.mean(accepts)), 3),
           "n_attempts": int(accepts.size),
           "mean_vol_drift": round(v_mean / v0 - 1.0, 5),
           "poisoned": bool(np.any(np.asarray(diag["poisoned"])))}
    for leg, vals in acc.items():
        out[f"{leg}_median_ms"] = round(float(np.median(vals)), 4)
        out[f"{leg}_all"] = [round(v, 4) for v in vals]
    out["npt_over_nve"] = round(out["npt_median_ms"]
                                / out["nve_median_ms"] - 1.0, 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
