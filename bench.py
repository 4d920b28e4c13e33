"""Benchmark harness: ms/step for energy+forces on the BASELINE.md ladder.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The headline metric is ms/step at the 30k-atom Ewald box on one TPU chip
(BASELINE.md target: <= 2 ms/step); vs_baseline = target_ms / measured_ms
(>1 beats the target).

Usage: python bench.py [30k|4k|216]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def build(config: str):
    from chargeflux_tpu.models import water_box

    if config == "216":
        force, pos, _, box = water_box(n_side=6, flux="bond_angle")
        method = "dense"
    elif config == "4k":
        force, pos, _, box = water_box(n_side=11, flux="bond_angle")
        method = "dense"
    elif config == "30k":
        force, pos, _, box = water_box(n_side=22, flux="bond_angle")
        method = "cell"
    elif config == "100k":
        force, pos, _, box = water_box(n_side=32, flux="bond_angle")
        method = "cell"
    else:
        raise SystemExit(f"unknown config {config!r}")
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method=method)
    return jnp.asarray(pos, jnp.float32), system


def bench_replicas(n_replicas: int = 64):
    """64-replica vmap ensemble on a 216-water box (BASELINE.md config)."""
    from chargeflux_tpu.energy import _energy
    from chargeflux_tpu.models import water_box

    force, pos, _, box = water_box(n_side=6, flux="bond_angle")
    system = force.create_system(box=box, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(np.stack(
        [pos + 0.01 * rng.standard_normal(pos.shape)
         for _ in range(n_replicas)]), jnp.float32)

    def step(xb, _):
        def one(xc):
            e, g = jax.value_and_grad(_energy)(xc, system)
            return xc - 1e-9 * g, e
        xb, es = jax.vmap(one)(xb)
        return xb, jnp.sum(es)

    from functools import partial as _p

    @_p(jax.jit, static_argnums=(1,))
    def run(x0, k):
        xk, es = jax.lax.scan(step, x0, None, length=k)
        return es[-1] + 0.0 * jnp.sum(xk)

    float(run(batch, 3)); float(run(batch, 13))

    def t(k):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(batch, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    ms = (t(13) - t(3)) / 10 * 1e3
    print(json.dumps({
        "metric": f"ms_per_step_{n_replicas}x216_replica_ensemble",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(2.0 * n_replicas / ms, 4),
    }))


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "30k"
    if config == "replicas":
        bench_replicas()
        return
    x, system = build(config)
    n = system.n_atoms

    from chargeflux_tpu.energy import _energy

    # Measurement methodology for the tunneled TPU platform: dispatch is
    # async and block_until_ready does not wait for remote completion, so a
    # single-step wall time only measures the ~30 ms tunnel roundtrip.
    # Instead run K steps of a force-relaxation loop *on device* in one
    # lax.scan (each step consumes the previous forces, so steps cannot be
    # collapsed), sync via a scalar fetch, and difference two run lengths to
    # cancel the fixed roundtrip overhead.
    def step(x_cur, _):
        e, g = jax.value_and_grad(_energy)(x_cur, system)
        return x_cur - 1e-7 * g, e

    @partial(jax.jit, static_argnums=(1,))
    def run(x0, k):
        xk, es = jax.lax.scan(step, x0, None, length=k)
        return es[-1] + 0.0 * jnp.sum(xk)

    k1, k2 = 5, 55
    t0 = time.perf_counter()
    float(run(x, k1))
    float(run(x, k2))
    compile_s = time.perf_counter() - t0

    def timed(k):
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(run(x, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    ms = (timed(k2) - timed(k1)) / (k2 - k1) * 1e3
    e = float(run(x, k1))

    target_ms = 2.0
    print(json.dumps({
        "metric": f"ms_per_step_{config}_ewald_f32",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(target_ms / ms, 4),
    }))
    print(f"# config={config} atoms={n} device={jax.devices()[0].device_kind} "
          f"compile={compile_s:.1f}s kmax={system.spec.kmax} "
          f"grid={system.spec.cell_grid} cap={system.spec.cell_capacity} "
          f"energy={e:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
