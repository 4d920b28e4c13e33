"""A/B the replica-ensemble scan carry layout: [R, N, 3] (minor dim 3)
vs flattened [R, N*3] — the same narrow-carry overhead found for the MD
integrators (tools/step_pieces.py) may tax the vmapped ensemble loop.
"""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan  # noqa: E402
from chargeflux_tpu.energy import _energy  # noqa: E402
from chargeflux_tpu.models import water_box  # noqa: E402
from chargeflux_tpu.parallel.replicas import vmap_friendly_system  # noqa: E402


def main():
    n_replicas = 64
    force, pos, _, box = water_box(n_side=6, flux="bond_angle")
    system = vmap_friendly_system(
        force.create_system(box=box, dtype=jnp.float32))
    rng = np.random.default_rng(0)
    batch = jnp.asarray(np.stack(
        [pos + 0.01 * rng.standard_normal(pos.shape)
         for _ in range(n_replicas)]), jnp.float32)
    n = batch.shape[1]

    def step_n3(xb, _):
        def one(xc):
            e, g = jax.value_and_grad(_energy)(xc, system)
            return xc - 1e-9 * g, e
        xb, es = jax.vmap(one)(xb)
        return xb, jnp.sum(es)

    def step_flat(xb, _):
        def one(xf):
            xc = xf.reshape(n, 3)
            e, g = jax.value_and_grad(_energy)(xc, system)
            return (xc - 1e-9 * g).reshape(-1), e
        xb, es = jax.vmap(one)(xb)
        return xb, jnp.sum(es)

    def runner(step):
        @partial(jax.jit, static_argnums=(1,))
        def run(x0, k):
            xk, es = jax.lax.scan(step, x0, None, length=k)
            return es[-1] + 0.0 * jnp.sum(xk)
        return run

    run_a = runner(step_n3)
    run_b = runner(step_flat)
    flat0 = batch.reshape(n_replicas, -1)
    # compile + warm
    for run, x0 in ((run_a, batch), (run_b, flat0)):
        float(run(x0, 3))
        float(run(x0, 13))
    t_end = time.perf_counter() + 8.0
    while time.perf_counter() < t_end:
        float(run_a(batch, 13))
    diffs_a, diffs_b = [], []
    for _ in range(5):
        for run, x0, d in ((run_a, batch, diffs_a), (run_b, flat0, diffs_b)):
            t0 = time.perf_counter(); float(run(x0, 13)); t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(x0, 3)); t1 = time.perf_counter() - t0
            d.append((t2 - t1) / 10 * 1e3)
    print(json.dumps({"layout": "n3", "ms": round(float(np.median(diffs_a)), 4)}))
    print(json.dumps({"layout": "flat", "ms": round(float(np.median(diffs_b)), 4)}))


if __name__ == "__main__":
    main()
