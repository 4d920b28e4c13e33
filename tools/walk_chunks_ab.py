"""Measure the concat walk's per-chunk scan overhead: the 30k config
(grid 8^3, chunks=1 by default) forced to walk_chunks in {1, 2, 4, 8},
full energy+grad loop, same-process alternated 50-step diffs.

Motivation: the 100k config's grid is 11^3 (prime), so the 320 MB tile
budget forces an 11-way chunk scan; if per-chunk overhead is material,
non-divisor (padded) chunking is worth implementing.
"""

import dataclasses
import json
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan, build  # noqa: E402
from chargeflux_tpu.energy import _energy  # noqa: E402


def main():
    x, system, _ = build("30k")

    def make_run(chunks):
        sys_c = dataclasses.replace(
            system, spec=dataclasses.replace(system.spec,
                                             walk_chunks=chunks))

        def step(xx, _):
            e, g = jax.value_and_grad(_energy)(xx, sys_c)
            return xx - 1e-12 * g, e

        @partial(jax.jit, static_argnums=(1,))
        def run(x0, k):
            xk, es = jax.lax.scan(step, x0, None, length=k)
            return es[-1] + 0.0 * jnp.sum(xk)
        return run

    runs = {c: make_run(c) for c in (1, 2, 4, 8)}
    for c, run in runs.items():
        float(run(x, 2))
    import time
    t_end = time.time() + 8.0
    while time.time() < t_end:
        float(runs[1](x, 12))
    res = {c: [] for c in runs}
    for _ in range(5):
        for c, run in runs.items():
            res[c].append(_timed_scan(run, x, 2, 52, reps=1, warm_s=0.5))
    for c in runs:
        print(json.dumps({"chunks": c,
                          "ms": round(float(np.median(res[c])), 4),
                          "all": [round(v, 4) for v in res[c]]}),
              flush=True)


if __name__ == "__main__":
    main()
