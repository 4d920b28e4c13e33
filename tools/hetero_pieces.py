"""Localize the hetero structural overhead (hetero_ab: s8 = 3.33 vs
water 2.92 ms — +0.4 ms at identical shapes, so it's program structure,
not solute size or offset alignment).

In-context marginal phase costs (bench.measure_phases methodology: 50-step
grad loops, t(base+phase) - t(base)) for the pure-water 30k box vs the
s8 solvated-chain box, PLUS a bonded marginal (hetero bonded splits
template + remainder) and the full e_fn — all in one process, alternated.

Usage: python tools/hetero_pieces.py
"""

import json
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan, build_full, wait_for_backend  # noqa: E402
from tools.hetero_ab import build_case  # noqa: E402


def phases(x, system, bonded):
    from chargeflux_tpu import cells
    from chargeflux_tpu.bonded import bonded_energy
    from chargeflux_tpu.charges import effective_charges
    from chargeflux_tpu.energy import _exclusion_correction
    from chargeflux_tpu.ewald import self_energy
    from chargeflux_tpu.neighbors import build_neighbor_state
    from chargeflux_tpu.pme import (_pallas_spread_ok,
                                    pme_cell_pallas_reciprocal_energy,
                                    pme_cell_reciprocal_energy)

    spec = system.spec
    nb = build_neighbor_state(x, system)
    ids = nb.slots.reshape(spec.cell_grid + (spec.cell_capacity,))
    recip_fn = (pme_cell_pallas_reciprocal_energy
                if _pallas_spread_ok(spec, x.dtype)
                else pme_cell_reciprocal_energy)

    def grad_loop(f, k1=2, k2=52):
        @partial(jax.jit, static_argnums=(1,))
        def run(x0, k):
            def step(xx, _):
                e, g = jax.value_and_grad(f)(xx)
                return xx - 1e-12 * g, e
            xk, es = jax.lax.scan(step, x0, None, length=k)
            return es[-1] + 0.0 * jnp.sum(xk)
        return _timed_scan(run, x, k1, k2, reps=5)

    def make_e(with_walk=False, with_recip=False, with_bonded=False,
               q_only=False):
        def f(xx):
            q = effective_charges(xx, system)
            if q_only:
                return jnp.sum(q * q)
            b = cells.blockify(xx, q, system, nb.slots, nb.inv_slot,
                               wrap=nb.wrap)
            e = (jnp.sum(b.x) * 1e-20 + self_energy(q, spec.alpha)
                 + _exclusion_correction(xx, q, system, True))
            if with_walk:
                e = e + cells.direct_energy_on_blocks(b, ids, system)
            if with_recip:
                e = e + recip_fn(b, ids, system)
            if with_bonded:
                e = e + bonded_energy(xx, bonded)
            return e
        return f

    out = {}
    out["q_grad_loop"] = round(grad_loop(make_e(q_only=True)), 3)
    t_base = grad_loop(make_e())
    out["base"] = round(t_base, 3)
    out["bonded_marginal"] = round(
        grad_loop(make_e(with_bonded=True)) - t_base, 3)
    out["direct_marginal"] = round(
        grad_loop(make_e(with_walk=True)) - t_base, 3)
    out["recip_marginal"] = round(
        grad_loop(make_e(with_recip=True)) - t_base, 3)
    out["full"] = round(grad_loop(
        make_e(with_walk=True, with_recip=True, with_bonded=True)), 3)
    return out


def main():
    wait_for_backend()
    from chargeflux_tpu.models import water_bonded_params

    x_w, sys_w, m_w, _f = build_full("30k")
    bonded_w = water_bonded_params(sys_w.n_atoms // 3, box=np.asarray(
        jax.device_get(sys_w.box)), dtype=jnp.float32)
    x_s, sys_s, m_s, _f2, bonded_s = build_case(8)

    for rep in range(2):
        for name, (x, system, bonded) in (
                ("water", (x_w, sys_w, bonded_w)),
                ("s8", (x_s, sys_s, bonded_s))):
            res = phases(x, system, bonded)
            res["case"] = name
            res["cap"] = system.spec.cell_capacity
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
