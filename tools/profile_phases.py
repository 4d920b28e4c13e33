"""Per-phase step timing at the 30k config on the real TPU.

Methodology (CLAUDE.md): each phase is wrapped in a K-step lax.scan whose
carry feeds the next step (so steps can't collapse), synced by a scalar
fetch; two run lengths are differenced to cancel the ~30 ms tunnel roundtrip.

Usage: python tools/profile_phases.py [30k|4k|100k] [phase ...]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def timed_loop(step_fn, x0, k1=5, k2=35, reps=5):
    """step_fn: x -> (x_next, scalar). Returns ms/step."""

    @partial(jax.jit, static_argnums=(1,))
    def run(x0, k):
        xk, es = jax.lax.scan(lambda x, _: step_fn(x), x0, None, length=k)
        return es[-1] + 0.0 * jnp.sum(xk)

    float(run(x0, k1))
    float(run(x0, k2))

    def t(k):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (t(k2) - t(k1)) / (k2 - k1) * 1e3


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "30k"
    only = set(sys.argv[2:])
    sys.path.insert(0, ".")
    from bench import build
    from chargeflux_tpu import cells
    from chargeflux_tpu.charges import effective_charges
    from chargeflux_tpu.energy import (_energy, _exclusion_correction,
                                       energy_fixed_charges)
    from chargeflux_tpu.ewald import reciprocal_energy, self_energy

    x, system, _ = build(config)
    spec = system.spec
    q0 = effective_charges(x, system)
    lr = 1e-9

    phases = {}

    def grad_phase(f):
        """x -> (x - lr*dE/dx, E); forward+backward of f."""
        def step(x):
            e, g = jax.value_and_grad(f)(x)
            return x - lr * g, e
        return step

    phases["full"] = grad_phase(lambda x: _energy(x, system))
    phases["charges"] = grad_phase(
        lambda x: jnp.sum(effective_charges(x, system) ** 2))
    phases["excl"] = grad_phase(
        lambda x: _exclusion_correction(x, q0, system, subtract_direct=True))
    phases["recip_xla"] = grad_phase(
        lambda x: reciprocal_energy(x, q0, system.box, spec.alpha, spec.kmax,
                                    method="xla"))
    phases["recip_pallas"] = grad_phase(
        lambda x: reciprocal_energy(x, q0, system.box, spec.alpha, spec.kmax,
                                    method="pallas"))
    phases["direct"] = grad_phase(
        lambda x: cells.cell_list_direct_energy(x, q0, system))

    from chargeflux_tpu.pme import (pme_cell_reciprocal_energy,
                                    pme_reciprocal_energy)
    phases["recip_pme"] = grad_phase(
        lambda x: pme_reciprocal_energy(x, q0, system.box, spec.alpha,
                                        spec.pme_grid, spec.pme_order))

    def e_pme_cell(x):
        slots, inv_slot, _ = cells.build_cell_list_full(
            x, system.box, spec.cell_grid, spec.cell_capacity)
        blocks = cells.blockify(x, q0, system, slots, inv_slot)
        return pme_cell_reciprocal_energy(blocks,
                                          slots.reshape(blocks.x.shape),
                                          system)
    phases["recip_pme_cell"] = grad_phase(e_pme_cell)

    def binning(x):
        slots, ov = cells.build_cell_list(x, system.box, spec.cell_grid,
                                          spec.cell_capacity)
        # feed something back so the scan carries a dependency
        return x + 0.0 * jnp.sum(slots % 7).astype(x.dtype), ov.astype(x.dtype)
    phases["binning"] = binning

    phases["fixedq"] = grad_phase(
        lambda x: energy_fixed_charges(x, q0, system))

    for name, fn in phases.items():
        if only and name not in only:
            continue
        try:
            ms = timed_loop(fn, x)
            print(f"{name:12s} {ms:8.3f} ms/step")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
