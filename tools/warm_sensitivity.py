"""Warmup-time sensitivity of the 30k MD-step measurement.

Device clocks ramp with sustained load (BASELINE.md: fresh processes read
~10% slow); this measures the same program with increasing warmup budgets
in ONE process to find where the reading plateaus, so bench.py's warmup
can be set to the steady-state point instead of an arbitrary 10 s.
"""

import json
import sys
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import DT_PS, _timed_scan, build  # noqa: E402


def main():
    from chargeflux_tpu.integrate import (init_state_nb, make_nb_energy_fn,
                                          nve_step_nb)
    from chargeflux_tpu.models import water_bonded_params
    from chargeflux_tpu.neighbors import suggest_rebuild_interval
    import numpy as np

    x, system, masses = build("30k")
    bonded = water_bonded_params(system.n_atoms // 3, box=np.asarray(
        jnp.asarray(system.box)), dtype=jnp.float32)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    s0 = init_state_nb(x, jnp.zeros_like(x), e_fn, init_nb)
    rebuild_every = suggest_rebuild_interval(system, DT_PS, cap=10)

    @partial(jax.jit, static_argnums=(1,))
    def run(s, k):
        def body(st, _):
            st = nve_step_nb(st, e_fn, masses, DT_PS)
            return st, st.potential

        def outer(st, _):
            st = st._replace(nb=init_nb(st.positions))
            return jax.lax.scan(body, st, None, length=rebuild_every)

        s_k, es = jax.lax.scan(outer, s, None, length=k)
        return es[-1, -1] + 0.0 * jnp.sum(s_k.positions)

    k1 = max(1, 10 // rebuild_every)
    # cumulative warm: each block adds warm_s on top of all previous load
    for warm in (10.0, 10.0, 10.0, 15.0, 15.0):
        ms = _timed_scan(run, s0, k1, 6 * k1, reps=7, warm_s=warm)
        print(json.dumps({"extra_warm_s": warm,
                          "ms_per_md_step": round(ms / rebuild_every, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
