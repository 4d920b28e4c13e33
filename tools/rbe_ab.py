"""NVT A/B: PME reciprocal vs random batch Ewald (rbe.py) at the bench
configs — the measurement VERDICT r2 item 5 asks for (house style:
measure-then-keep; rbe promised ~0.05 ms vs ~0.9 ms PME recip at 100k).

Both legs run the same BAOAB Langevin NVT loop (packed [N, 9] carry,
chunked neighbor rebuilds); only the reciprocal estimator differs.
Alternated same-process reps so tunnel/thermal drift cancels
(BASELINE.md measurement rules).

Usage: python tools/rbe_ab.py [100k|30k] [n_samples] [reps]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import DT_PS, _timed_scan, build_full, wait_for_backend  # noqa: E402


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "100k"
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    wait_for_backend()

    from chargeflux_tpu.integrate import (init_state_nb,
                                          langevin_trajectory_nb,
                                          make_nb_energy_fn,
                                          maxwell_velocities)
    from chargeflux_tpu.models import water_bonded_params
    from chargeflux_tpu.neighbors import suggest_rebuild_interval
    from chargeflux_tpu.rbe import (make_rbe_nb_energy_fn,
                                    rbe_langevin_trajectory_nb)

    x, system, masses, _force = build_full(config)
    bonded = water_bonded_params(system.n_atoms // 3, box=np.asarray(
        jax.device_get(system.box)), dtype=jnp.float32)
    re = suggest_rebuild_interval(system, DT_PS, max_speed=24.0, cap=10)
    v0 = maxwell_velocities(masses, 150.0, jax.random.PRNGKey(0),
                            dtype=jnp.float32)

    e_fn_p, init_nb_p = make_nb_energy_fn(system, bonded=bonded)
    e_fn_r, init_nb_r = make_rbe_nb_energy_fn(system, n_samples,
                                              bonded=bonded)
    s0 = init_state_nb(x, v0, e_fn_p, init_nb_p)

    def make_run(kind):
        if kind == "pme":
            def run(state, k):
                _s, kes = langevin_trajectory_nb(
                    state, e_fn_p, init_nb_p, masses, DT_PS, 150.0, 20.0,
                    jax.random.PRNGKey(1), n_steps=k * re,
                    rebuild_every=re)
                return kes[-1]
        else:
            def run(state, k):
                _s, kes = rbe_langevin_trajectory_nb(
                    state, e_fn_r, init_nb_r, masses, DT_PS, 150.0, 20.0,
                    jax.random.PRNGKey(1), n_steps=k * re,
                    rebuild_every=re)
                return kes[-1]
        return jax.jit(run, static_argnums=(1,))

    runs = {k: make_run(k) for k in ("pme", "rbe")}
    acc = {k: [] for k in runs}
    k1 = max(1, 10 // re)
    for _ in range(reps):
        for kind, run in runs.items():
            ms = _timed_scan(run, s0, k1, 6 * k1, reps=5) / re
            acc[kind].append(ms)
            print(json.dumps({"kind": kind, "config": config,
                              "n_samples": n_samples,
                              "ms_per_nvt_step": round(ms, 4)}), flush=True)
    for kind in runs:
        print(json.dumps({"kind": kind, "config": config,
                          "median_ms": round(float(np.median(acc[kind])), 4),
                          "all": [round(v, 3) for v in acc[kind]]}),
              flush=True)


if __name__ == "__main__":
    main()
