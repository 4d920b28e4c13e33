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

# -- appended: PME-on-blocks sub-op benchmarks (run: python tools/microbench.py pme_sub) --
def pme_sub():
    import os, sys as _s
    _s.path.insert(0, os.getcwd())
    import jax, numpy as np, jax.numpy as jnp
    rng = np.random.default_rng(0)
    NC, CAP, W, G = 343, 128, 18, 50
    wl = jnp.asarray(rng.random((NC, CAP, W)), jnp.float32)
    q = jnp.asarray(rng.random((NC, CAP)), jnp.float32)
    P = jnp.asarray(rng.random((7,7,7,W,W,W)), jnp.float32)
    g3 = jnp.asarray(rng.random((G,G,G)), jnp.float32)
    u = jnp.asarray(rng.random((NC, CAP)), jnp.float32) * G

    def t_of(step, x0):
        return timed(step, x0)

    def fft_case(v):
        gk = jnp.fft.rfftn(g3 + v[0])
        s = jnp.sum(gk.real**2 + gk.imag**2)
        return v + 1e-12*s, s
    print("fft75_fwd        ", t_of(fft_case, jnp.zeros(8)))

    def fftgrad_case(v):
        f = lambda g: jnp.sum(jnp.abs(jnp.fft.rfftn(g + v[0]))**2)
        s = jnp.sum(jax.grad(f)(g3))
        return v + 1e-12*s, s
    print("fft75_fwd+grad   ", t_of(fftgrad_case, jnp.zeros(8)))

    def einsum_case(v):
        a = (q[..., None] * wl)[..., :, None] * wl[..., None, :]
        a = a.reshape(NC, CAP, W*W)
        p = jnp.einsum("caw,caz->cwz", a, wl + v[0],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3)
        s = jnp.sum(p)
        return v + 1e-12*s, s
    print("patch_einsum_fwd ", t_of(einsum_case, jnp.zeros(8)))

    def einsum_grad(v):
        def f(wla):
            a = (q[..., None] * wla)[..., :, None] * wla[..., None, :]
            a = a.reshape(NC, CAP, W*W)
            p = jnp.einsum("caw,caz->cwz", a, wla,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3)
            return jnp.sum(p*p)
        s = jnp.sum(jax.grad(f)(wl + v[0]))
        return v + 1e-12*s, s
    print("patch_einsum_f+g ", t_of(einsum_grad, jnp.zeros(8)))

    from chargeflux_tpu.pme import _fold_axis, _patch_origins
    orgs = _patch_origins(7, G, 8)
    def fold_case(v):
        b = _fold_axis(P + v[0], orgs, G, patch_axis=5, cell_axis=2)
        b = _fold_axis(b, orgs, G, patch_axis=3, cell_axis=1)
        qg = _fold_axis(b, orgs, G, patch_axis=1, cell_axis=0)
        s = jnp.sum(qg)
        return v + 1e-12*s, s
    print("folds_fwd        ", t_of(fold_case, jnp.zeros(8)))

    def fold_grad(v):
        def f(Pp):
            b = _fold_axis(Pp, orgs, G, patch_axis=5, cell_axis=2)
            b = _fold_axis(b, orgs, G, patch_axis=3, cell_axis=1)
            qg = _fold_axis(b, orgs, G, patch_axis=1, cell_axis=0)
            return jnp.sum(qg*qg)
        s = jnp.sum(jax.grad(f)(P + v[0]))
        return v + 1e-12*s, s
    print("folds_fwd+grad   ", t_of(fold_grad, jnp.zeros(8)))

    from chargeflux_tpu.pme import bspline
    def weights_case(v):
        t = (u[..., None] - jnp.arange(W, dtype=jnp.float32)) + v[0]
        s = jnp.sum(bspline(t, 8)) + jnp.sum(bspline(t, 8)*t) + jnp.sum(bspline(t,8)/ (t+100))
        return v + 1e-12*s, s
    print("weights3x_fwd    ", t_of(weights_case, jnp.zeros(8)))

if __name__ == "__main__" and "pme_sub" in sys.argv:
    pme_sub()
    sys.exit(0)

def gather_variants():
    import os, sys as _s
    _s.path.insert(0, os.getcwd())
    import numpy as np, jax.numpy as jnp
    rng = np.random.default_rng(0)
    N, S = 32768, 43904            # atoms, slot count (343*128)
    flat = jnp.asarray(rng.permutation(S)[:N], jnp.int32)   # atom -> slot
    # slot -> atom (sentinel N for empty)
    inv = np.full(S, N, np.int64); inv[np.asarray(flat)] = np.arange(N)
    slots = jnp.asarray(inv, jnp.int32)
    x0 = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)

    def six_gathers(v):
        vp = jnp.concatenate([v, jnp.zeros((1, 8), jnp.float32)])
        cols = [vp[:, k][slots] for k in range(6)]
        s = sum(jnp.sum(c) for c in cols)
        return v + 1e-12 * s, s
    print("six_single_gathers_44k  ", timed(six_gathers, x0))

    def row_gather(v):
        vp = jnp.concatenate([v, jnp.zeros((1, 8), jnp.float32)])
        g = vp[slots]               # [S, 8] row gather
        s = jnp.sum(g)
        return v + 1e-12 * s, s
    print("row_gather_44k_x8       ", timed(row_gather, x0))

    def row_gather4(v):
        vp = jnp.concatenate([v[:, :4], jnp.zeros((1, 4), jnp.float32)])
        g = vp[slots]               # [S, 4]
        s = jnp.sum(g)
        return v + 1e-12 * s, s
    print("row_gather_44k_x4       ", timed(row_gather4, x0))

    def scatter_back(v):
        big = jnp.pad(v[:, :4], ((0, S - N), (0, 0)))
        out = jnp.zeros((N, 4), jnp.float32).at[slots[:N]].add(big[:N])
        s = jnp.sum(out)
        return v + 1e-12 * s, s
    print("scatter_44k_to_32k_x4   ", timed(scatter_back, x0))

    def inv_gather(v):
        big = jnp.pad(v[:, :4], ((0, S - N + 1), (0, 0)))
        out = big[flat]             # [N, 4] permutation gather
        s = jnp.sum(out)
        return v + 1e-12 * s, s
    print("inv_perm_gather_32k_x4  ", timed(inv_gather, x0))

if __name__ == "__main__" and "gathers" in sys.argv:
    gather_variants()
    sys.exit(0)

def binning_100k():
    import os, sys as _s
    _s.path.insert(0, os.getcwd())
    import numpy as np, jax, jax.numpy as jnp
    rng = np.random.default_rng(0)
    N = 98304
    box = jnp.asarray([9.9424]*3, jnp.float32)
    x0 = jnp.asarray(rng.uniform(0, 9.9424, (N, 3)), jnp.float32)
    grid = (10, 10, 10); cap = 160

    def via(branch):
        def step(x):
            gvec = jnp.asarray(np.asarray(grid), x.dtype)
            frac = x / box; frac = frac - jnp.floor(frac)
            ci = jnp.clip((frac * gvec).astype(jnp.int32), 0, 9)
            cell_id = (ci[:, 0] * 10 + ci[:, 1]) * 10 + ci[:, 2]
            n_cells = 1000
            if branch == "onehot":
                onehot = (cell_id[:, None] == jnp.arange(n_cells)[None, :]).astype(jnp.int32)
                cum = jnp.cumsum(onehot, axis=0)
                rank = cum[jnp.arange(N), cell_id] - 1
                atom_ids = jnp.arange(N, dtype=jnp.int32)
                flat = cell_id * cap + rank
            else:
                order = jnp.argsort(cell_id)
                scid = cell_id[order]
                first = jnp.searchsorted(scid, scid, side="left")
                rank = jnp.arange(N, dtype=jnp.int32) - first.astype(jnp.int32)
                atom_ids = order.astype(jnp.int32)
                flat = scid * cap + rank
            ok = rank < cap
            slot_of = jnp.where(ok, flat, n_cells * cap).astype(jnp.int32)
            slots = jnp.full((n_cells * cap,), N, jnp.int32).at[slot_of].set(atom_ids, mode="drop")
            return x + 0.0 * jnp.sum(slots % 7).astype(x.dtype), jnp.sum(rank).astype(x.dtype)
        return step
    for b in ("onehot", "sort"):
        print(f"bin100k_{b:7s}", timed(via(b), x0, k1=3, k2=13))

if __name__ == "__main__" and "bin100k" in sys.argv:
    binning_100k()
    sys.exit(0)

def walk_30k():
    import os, sys as _s
    _s.path.insert(0, os.getcwd())
    import numpy as np, jax, jax.numpy as jnp
    from bench import build
    from chargeflux_tpu import cells
    from chargeflux_tpu.charges import effective_charges

    x, system, _ = build("30k")
    spec = system.spec
    q0 = effective_charges(x, system)
    slots, inv, _ = cells.build_cell_list_full(x, system.box, spec.cell_grid,
                                               spec.cell_capacity)

    def blocks_of(xx):
        return cells.blockify(xx, q0, system, slots, inv)

    ids = slots.reshape(spec.cell_grid + (spec.cell_capacity,))

    def fwd_only(xx):
        b = blocks_of(xx)
        e = cells._roll_block_energy(b, ids, system)
        return xx + 1e-12 * e, e
    print("walk_fwd_only      ", timed(fwd_only, x, k1=3, k2=23, reps=5))

    def fused(xx):
        b = blocks_of(xx)
        e, g, dq = cells._roll_fused_walk(b, ids, system)
        s = e + 1e-12 * (jnp.sum(g[0]) + jnp.sum(dq))
        return xx + 1e-12 * s, s
    print("walk_fused_e_g_dq  ", timed(fused, x, k1=3, k2=23, reps=5))

    def blockify_only(xx):
        b = blocks_of(xx)
        s = jnp.sum(b.q) + jnp.sum(b.x)
        return xx + 1e-12 * s, s
    print("blockify_only      ", timed(blockify_only, x, k1=3, k2=23, reps=5))

if __name__ == "__main__" and "walk30k" in sys.argv:
    walk_30k()
    sys.exit(0)

def blockify_parts():
    import os, sys as _s
    _s.path.insert(0, os.getcwd())
    import numpy as np, jax, jax.numpy as jnp
    from bench import build
    from chargeflux_tpu import cells
    from chargeflux_tpu.charges import effective_charges

    x, system, _ = build("30k")
    spec = system.spec
    q0 = effective_charges(x, system)
    slots, inv, _ = cells.build_cell_list_full(x, system.box, spec.cell_grid,
                                               spec.cell_capacity)
    flat = slots.reshape(-1)
    n = x.shape[0]
    dtype = x.dtype
    box = system.box
    hs = 0.5 * system.sigma.astype(dtype)[:, None]
    se = 2.0 * jnp.sqrt(system.epsilon.astype(dtype))[:, None]

    def table_only(xx):
        pos_w = xx - box * jnp.floor(xx / box)
        table = jnp.concatenate([pos_w, q0[:, None], hs, se,
                                 jnp.zeros((n, 2), dtype)], axis=1)
        s = jnp.sum(table)
        return xx + 1e-12 * s, s
    print("table_build_only   ", timed(table_only, x, k1=3, k2=33, reps=5))

    def table_gather(xx):
        pos_w = xx - box * jnp.floor(xx / box)
        table = jnp.concatenate([pos_w, q0[:, None], hs, se,
                                 jnp.zeros((n, 2), dtype)], axis=1)
        table = jnp.concatenate([table, jnp.zeros((1, 8), dtype)], axis=0)
        g = table[flat]
        s = jnp.sum(g)
        return xx + 1e-12 * s, s
    print("table_plus_gather  ", timed(table_gather, x, k1=3, k2=33, reps=5))

    def unpack(xx):
        b = cells.blockify(xx, q0, system, slots, inv)
        s = jnp.sum(b.x) + jnp.sum(b.q)
        return xx + 1e-12 * s, s
    print("blockify_full      ", timed(unpack, x, k1=3, k2=33, reps=5))

if __name__ == "__main__" and "blockify" in sys.argv:
    blockify_parts()
    sys.exit(0)

def vpu_roofline():
    import numpy as np, jax, jax.numpy as jnp
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((343, 128, 128)), jnp.float32)  # walk block shape

    def chain(k):
        def step(x):
            y = x
            for i in range(k):
                y = y * 1.000001 + 0.3
            s = jnp.sum(y)
            return x + 1e-12 * s, s
        return step

    n = a.size
    for k in (16, 64, 256):
        ms = timed(chain(k), a, k1=3, k2=13, reps=5)
        print(f"fma_chain_k={k:3d}  {ms:7.3f} ms  -> {2*k*n/ms/1e9:.2f} TF/s")

    def rsqrt_exp(x):
        y = jax.lax.rsqrt(x + 1.0)
        z = jnp.exp(-x * x)
        s = jnp.sum(y + z)
        return x + 1e-12 * s, s
    ms = timed(rsqrt_exp, a, k1=3, k2=13, reps=5)
    print(f"rsqrt+exp          {ms:7.3f} ms  ({n/1e6:.0f}M elems)")

if __name__ == "__main__" and "roofline" in sys.argv:
    vpu_roofline()
    sys.exit(0)
