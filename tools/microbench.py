"""Primitive-cost microbenchmarks on the TPU (scatter/gather/FFT/matmul).

Each candidate is timed as a K-step scan whose carry feeds the next step
(CLAUDE.md methodology). Usage: python tools/microbench.py [name ...]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def timed(step_fn, x0, k1=5, k2=45, reps=5):
    @partial(jax.jit, static_argnums=(1,))
    def run(x0, k):
        xk, es = jax.lax.scan(lambda x, _: step_fn(x), x0, None, length=k)
        return es[-1] + 0.0 * jnp.sum(xk)

    float(run(x0, k1)); float(run(x0, k2))

    def t(k):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (t(k2) - t(k1)) / (k2 - k1) * 1e3


def main():
    only = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    N = 32768
    T = 65536
    idx = jnp.asarray(rng.integers(0, N, T), jnp.int32)
    ell_idx = jnp.asarray(rng.integers(0, T, (N, 7)), jnp.int32)
    x0 = jnp.asarray(rng.standard_normal(T), jnp.float32)

    cases = {}

    def scatter_add(v):
        y = jnp.zeros(N, jnp.float32).at[idx].add(v)
        return v + 1e-12 * y[idx], jnp.sum(y)
    cases["scatter_add_64k_to_32k"] = scatter_add

    def gather_t(v):
        y = v[idx[:N] % T]
        return v + 1e-12 * jnp.pad(y, (0, T - N)), jnp.sum(y)
    cases["gather_32k_from_64k"] = gather_t

    def ell_gather(v):
        y = jnp.sum(v[ell_idx], axis=1)          # [N]
        return v + 1e-12 * jnp.pad(y, (0, T - N)), jnp.sum(y)
    cases["ell_gather_32kx7"] = ell_gather

    def take_along(v):
        vv = jnp.broadcast_to(v[None, :], (1, T))
        y = jnp.sum(jnp.take_along_axis(vv, ell_idx.reshape(1, -1),
                                        axis=1).reshape(N, 7), axis=1)
        return v + 1e-12 * jnp.pad(y, (0, T - N)), jnp.sum(y)
    cases["take_along_32kx7"] = take_along

    # one-hot matmul SpMV: [N, T] too big; segment trick: bound S per atom
    def fft64(v):
        g = jnp.zeros((64, 64, 64), jnp.float32).at[0, 0, :64].set(v[:64])
        gk = jnp.fft.rfftn(g)
        out = jnp.fft.irfftn(gk * jnp.abs(gk), g.shape)
        return v + 1e-12 * jnp.pad(out[0, 0, :64], (0, T - 64)), jnp.sum(out)
    cases["fft_rfftn_64cubed_roundtrip"] = fft64

    def fft48(v):
        g = jnp.zeros((48, 48, 48), jnp.float32).at[0, 0, :48].set(v[:48])
        gk = jnp.fft.rfftn(g)
        out = jnp.fft.irfftn(gk * jnp.abs(gk), g.shape)
        return v + 1e-12 * jnp.pad(out[0, 0, :48], (0, T - 48)), jnp.sum(out)
    cases["fft_rfftn_48cubed_roundtrip"] = fft48

    W = jnp.asarray(rng.standard_normal((N, 64)), jnp.float32)

    def sep_contract(v):
        # PME dense-separable cost model: 64 x-cols of (Wy*a).T @ Wz
        a = jnp.broadcast_to(v[:N, None], (N, 64))

        def col(c):
            return (W * c[:, None]).T @ W          # [64, 64]

        cols = jax.lax.map(col, a.T, batch_size=8)  # [64, 64, 64]
        s = jnp.sum(cols)
        return v + 1e-12 * s, s
    cases["pme_dense_sep_contract_fwd"] = sep_contract

    def scatter_2m(v):
        big = jnp.broadcast_to(v[:, None], (T, 32)).reshape(-1)
        bidx = jnp.concatenate([idx] * 32)
        y = jnp.zeros(N, jnp.float32).at[bidx].add(big)
        return v + 1e-12 * y[idx], jnp.sum(y)
    cases["scatter_add_2M_to_32k"] = scatter_2m

    for name, fn in cases.items():
        if only and name not in only:
            continue
        try:
            ms = timed(fn, x0)
            print(f"{name:32s} {ms:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
