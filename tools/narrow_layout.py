"""Measure the cost of elementwise chains on [N, 3] vs [3N] vs [3, N]
layouts at the 30k size — testing whether TPU lane padding (minor dim 3
padded to the 128 vector lanes) makes [N, 3] integration arithmetic ~40x
more expensive than its logical size.
"""

import json
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan  # noqa: E402


def main():
    n = 31944
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    m = jnp.asarray(rng.uniform(1.0, 16.0, (n,)), jnp.float32)

    def chain_n3(x, v, f, inv_m):
        # 10 verlet-like elementwise passes
        for _ in range(5):
            v = v + 0.5e-3 * f * inv_m
            x = x + 1e-3 * v
        return x, v

    def run_factory(x0, v0, f0, im):
        @partial(jax.jit, static_argnums=(1,))
        def run(x, k):
            def body(carry, _):
                xx, vv = carry
                xx, vv = chain_n3(xx, vv, f0 * 1.0, im)
                return (xx, vv), jnp.sum(xx[0])
            (xk, vk), es = jax.lax.scan(body, (x, v0), None, length=k)
            return es[-1] + 0.0 * (jnp.sum(xk) + jnp.sum(vk))
        return run

    im3 = (1.0 / m)[:, None]
    run_n3 = run_factory(x3, x3 * 0.1, x3 * 0.2, im3)

    flat = x3.reshape(-1)
    imf = jnp.repeat(1.0 / m, 3)
    run_flat = run_factory(flat, flat * 0.1, flat * 0.2, imf)

    x3t = x3.T                      # [3, N]
    imt = (1.0 / m)[None, :]
    run_t = run_factory(x3t, x3t * 0.1, x3t * 0.2, imt)

    out = {}
    out["n3"] = _timed_scan(run_n3, x3, 10, 510, reps=5, warm_s=5.0)
    out["flat"] = _timed_scan(run_flat, flat, 10, 510, reps=5, warm_s=0.0)
    out["transposed"] = _timed_scan(run_t, x3t, 10, 510, reps=5, warm_s=0.0)
    for name, ms in out.items():
        print(json.dumps({"layout": name, "ms_per_iter": round(ms, 5)}))


if __name__ == "__main__":
    main()
