"""Locate the direct walk's in-context overhead at the 30k bench config.

BASELINE.md: the fused roll walk measures 1.65 ms standalone (frozen
blocks, fwd+bwd) but its in-context marginal is 2.35-2.40 ms.  This tool
times a ladder of contexts to attribute the difference:

  A  fused walk fwd+bwd on frozen blocks (no blockify, no charges)
  B  + blockify fwd+bwd (frozen binning, grad wrt positions)
  C  + effective charges q(x) feeding the blocks
  D  C + exclusion + self (== make_e(True, False) of bench.measure_phases)
  E  walk fwd only (no grad) on frozen blocks

Usage: python tools/walk_context.py
"""

import json
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan, build  # noqa: E402
from chargeflux_tpu import cells  # noqa: E402
from chargeflux_tpu.charges import effective_charges  # noqa: E402
from chargeflux_tpu.energy import _exclusion_correction  # noqa: E402
from chargeflux_tpu.ewald import self_energy  # noqa: E402
from chargeflux_tpu.neighbors import build_neighbor_state  # noqa: E402


def main():
    x, system, _ = build("30k")
    spec = system.spec
    nb = build_neighbor_state(x, system)
    ids = nb.slots.reshape(spec.cell_grid + (spec.cell_capacity,))
    q0 = effective_charges(x, system)
    blocks0 = cells.blockify(x, q0, system, nb.slots, nb.inv_slot,
                             wrap=nb.wrap)

    def grad_loop(f, x0, k1=2, k2=52):
        @partial(jax.jit, static_argnums=(1,))
        def run(xx0, k):
            def step(xx, _):
                e, g = jax.value_and_grad(f)(xx)
                return jax.tree.map(lambda a, b: a - 1e-12 * b, xx, g), e
            xk, es = jax.lax.scan(step, xx0, None, length=k)
            return es[-1] + 0.0 * jnp.sum(jax.tree.leaves(xk)[0])
        return _timed_scan(run, x0, k1, k2, reps=5)

    def fwd_loop(f, x0, k1=2, k2=52):
        @partial(jax.jit, static_argnums=(1,))
        def run(xx0, k):
            def step(xx, _):
                e = f(xx)
                return jax.tree.map(lambda a: a + 1e-20 * e, xx), e
            xk, es = jax.lax.scan(step, xx0, None, length=k)
            return es[-1] + 0.0 * jnp.sum(jax.tree.leaves(xk)[0])
        return _timed_scan(run, x0, k1, k2, reps=5)

    out = {}

    # A: fused walk fwd+bwd on frozen blocks
    fA = lambda b: cells.direct_energy_on_blocks(b, ids, system)
    out["A_walk_on_blocks_grad"] = round(grad_loop(fA, blocks0), 3)

    # E: walk fwd only on frozen blocks
    out["E_walk_on_blocks_fwd"] = round(fwd_loop(fA, blocks0), 3)

    # B: blockify(x, frozen q) + walk, grad wrt x
    def fB(xx):
        b = cells.blockify(xx, q0, system, nb.slots, nb.inv_slot,
                           wrap=nb.wrap)
        return cells.direct_energy_on_blocks(b, ids, system)
    out["B_blockify_walk_grad"] = round(grad_loop(fB, x), 3)

    # C: charges + blockify + walk
    def fC(xx):
        q = effective_charges(xx, system)
        b = cells.blockify(xx, q, system, nb.slots, nb.inv_slot,
                           wrap=nb.wrap)
        return cells.direct_energy_on_blocks(b, ids, system)
    out["C_charges_blockify_walk_grad"] = round(grad_loop(fC, x), 3)

    # D: full make_e(True, False) equivalent
    def fD(xx):
        q = effective_charges(xx, system)
        b = cells.blockify(xx, q, system, nb.slots, nb.inv_slot,
                           wrap=nb.wrap)
        return (jnp.sum(b.x) * 1e-20 + self_energy(q, spec.alpha)
                + _exclusion_correction(xx, q, system, True)
                + cells.direct_energy_on_blocks(b, ids, system))
    out["D_base_plus_walk_grad"] = round(grad_loop(fD, x), 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
