"""Attribute the full-MD-step cost at the 30k bench config.

BASELINE.md: the phase marginals (direct+recip+base+amortized binning)
sum to ~2.8 ms but the full NVE step measures 3.10 — this times the
remaining pieces in one process, with the same nested-scan rebuild
amortization as bench.measure_md_step:

  grad      value_and_grad of _energy with nb reuse (no bonded/guard)
  +bonded   + harmonic water bond/angle terms
  +guard    + neighbor-freshness NaN poison
  nve       full velocity-Verlet step (bench configuration)
"""

import json
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import DT_PS, _timed_scan, build  # noqa: E402
from chargeflux_tpu.energy import _energy  # noqa: E402
from chargeflux_tpu.bonded import bonded_energy  # noqa: E402
from chargeflux_tpu.integrate import (init_state_nb, make_nb_energy_fn,  # noqa: E402
                                      nve_step_nb)
from chargeflux_tpu.models import water_bonded_params  # noqa: E402
from chargeflux_tpu.neighbors import (build_neighbor_state,  # noqa: E402
                                      neighbor_state_fresh,
                                      suggest_rebuild_interval)


def main():
    x, system, masses = build("30k")
    rebuild_every = suggest_rebuild_interval(system, DT_PS, cap=10)
    bonded = water_bonded_params(system.n_atoms // 3, box=np.asarray(
        jnp.asarray(system.box)), dtype=jnp.float32)

    def make_grad_runner(with_bonded, with_guard):
        def e_of(xx, nb):
            e = _energy(xx, system, nb=nb)
            if with_bonded:
                e = e + bonded_energy(xx, bonded)
            return e

        @partial(jax.jit, static_argnums=(1,))
        def run(x0, k):
            def body(xx, _):
                nb = body.nb
                e, g = jax.value_and_grad(e_of)(xx, nb)
                if with_guard:
                    bad = jnp.where(neighbor_state_fresh(nb, xx, system),
                                    1.0, jnp.asarray(jnp.nan, e.dtype))
                    e = e * bad
                    g = g * bad
                return xx - 1e-12 * g, e

            def outer(xx, _):
                body.nb = jax.lax.stop_gradient(
                    build_neighbor_state(xx, system))
                return jax.lax.scan(body, xx, None, length=rebuild_every)

            xk, es = jax.lax.scan(outer, x0, None, length=k)
            return es[-1, -1] + 0.0 * jnp.sum(xk)

        return run

    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    s0 = init_state_nb(x, jnp.zeros_like(x), e_fn, init_nb)

    @partial(jax.jit, static_argnums=(1,))
    def run_nve(s, k):
        def body(st, _):
            st = nve_step_nb(st, e_fn, masses, DT_PS)
            return st, st.potential

        def outer(st, _):
            st = st._replace(nb=init_nb(st.positions))
            return jax.lax.scan(body, st, None, length=rebuild_every)

        s_k, es = jax.lax.scan(outer, s, None, length=k)
        return es[-1, -1] + 0.0 * jnp.sum(s_k.positions)

    @partial(jax.jit, static_argnums=(1,))
    def run_nve_closure(s, k):
        """nve with nb closed over by the inner scan instead of carried."""
        def outer(st, _):
            nb = init_nb(st[0])

            def body(st4, _):
                xx, v, f, pe = st4
                inv_m = (1.0 / masses)[:, None]
                v_half = v + 0.5 * DT_PS * f * inv_m
                x_new = xx + DT_PS * v_half
                e, f_new, _ = e_fn(x_new, nb)
                v_new = v_half + 0.5 * DT_PS * f_new * inv_m
                return (x_new, v_new, f_new, e), e

            return jax.lax.scan(body, st, None, length=rebuild_every)

        st0 = (s.positions, s.velocities, s.forces, s.potential)
        s_k, es = jax.lax.scan(outer, st0, None, length=k)
        return es[-1, -1] + 0.0 * jnp.sum(s_k[0])

    def e_of_full(xx, nb):
        e = _energy(xx, system, nb=nb)
        return e + bonded_energy(xx, bonded)

    @partial(jax.jit, static_argnums=(1,))
    def run_vchain(s, k):
        """grad-runner with a velocity chain but no force carry: isolates
        whether the nve tax is the v-chain or the f carry."""
        def outer(st, _):
            nb = init_nb(st[0])

            def body(st2, _):
                xx, v = st2
                e, g = jax.value_and_grad(e_of_full)(xx, nb)
                v_new = v - DT_PS * g / masses[:, None]
                return (xx + DT_PS * v_new, v_new), e

            return jax.lax.scan(body, st, None, length=rebuild_every)

        s_k, es = jax.lax.scan(outer, (s.positions, s.velocities), None,
                               length=k)
        return es[-1, -1] + 0.0 * jnp.sum(s_k[0])

    @partial(jax.jit, static_argnums=(1,))
    def run_fcarry(s, k):
        """full verlet force carry, but gradient-only (no energy value)."""
        def outer(st, _):
            nb = init_nb(st[0])

            def body(st3, _):
                xx, v, f = st3
                inv_m = (1.0 / masses)[:, None]
                v_half = v + 0.5 * DT_PS * f * inv_m
                x_new = xx + DT_PS * v_half
                e, g = jax.value_and_grad(e_of_full)(x_new, nb)
                f_new = -g
                v_new = v_half + 0.5 * DT_PS * f_new * inv_m
                return (x_new, v_new, f_new), e

            return jax.lax.scan(body, st, None, length=rebuild_every)

        s_k, es = jax.lax.scan(
            outer, (s.positions, s.velocities, s.forces), None, length=k)
        return es[-1, -1] + 0.0 * jnp.sum(s_k[0])

    @partial(jax.jit, static_argnums=(1,))
    def run_packed(s, k):
        """full verlet with x/v/f packed into ONE [n, 9] carry array —
        tests whether the nve tax is per-carry-buffer overhead."""
        def outer(st, _):
            nb = init_nb(st[:, 0:3])

            def body(p, _):
                xx, v, f = p[:, 0:3], p[:, 3:6], p[:, 6:9]
                inv_m = (1.0 / masses)[:, None]
                v_half = v + 0.5 * DT_PS * f * inv_m
                x_new = xx + DT_PS * v_half
                e, g = jax.value_and_grad(e_of_full)(x_new, nb)
                f_new = -g
                v_new = v_half + 0.5 * DT_PS * f_new * inv_m
                return jnp.concatenate([x_new, v_new, f_new], axis=1), e

            return jax.lax.scan(body, st, None, length=rebuild_every)

        p0 = jnp.concatenate([s.positions, s.velocities, s.forces], axis=1)
        s_k, es = jax.lax.scan(outer, p0, None, length=k)
        return es[-1, -1] + 0.0 * jnp.sum(s_k)

    runners = {
        "grad": (make_grad_runner(False, False), x),
        "grad_bonded_guard": (make_grad_runner(True, True), x),
        "vchain": (run_vchain, s0),
        "fcarry_noguard": (run_fcarry, s0),
        "packed_noguard": (run_packed, s0),
        "nve": (run_nve, s0),
    }
    k1, k2 = 1, 6
    # compile+warm all, then alternate reps so drift cancels across
    # variants, not just within one
    import time
    for name, (run, x0) in runners.items():
        float(run(x0, k1))
        float(run(x0, k2))
    t_end = time.perf_counter() + 10.0
    while time.perf_counter() < t_end:
        float(run_nve(s0, k2))
    diffs = {name: [] for name in runners}
    for _ in range(5):
        for name, (run, x0) in runners.items():
            t0 = time.perf_counter()
            float(run(x0, k2))
            t2 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(x0, k1))
            t1 = time.perf_counter() - t0
            diffs[name].append((t2 - t1) / (k2 - k1) * 1e3)
    for name, ds in diffs.items():
        ms = float(np.median(ds))
        print(json.dumps({"piece": name,
                          "ms_per_step": round(ms / rebuild_every, 4)}))


if __name__ == "__main__":
    main()
