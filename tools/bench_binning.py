"""TPU micro-bench: binning strategies for build_cell_list_full.

Usage: python tools/bench_binning.py [n_side]
Measures (a) the current one-hot-cumsum binning, (b) its pieces, and (c) a
two-stage hierarchical variant (columns first, z within column) that cuts
the one-hot work from O(N * n_cells) to O(N * n_cols + n_slots * gz).
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from chargeflux_tpu import cells
from chargeflux_tpu.models import water_box


def two_stage_bin(positions, box, grid, capacity: int):
    """Hierarchical binning: rank atoms within their (cx, cy) column, stage
    them column-major, then rank within z-cells on the staged layout.
    Produces the same (slots, inv_slot, overflow) contract as
    build_cell_list_full (identical slot layout when nothing overflows)."""
    n = positions.shape[0]
    gx, gy, gz = grid
    ncol = gx * gy
    gvec = jnp.asarray(np.asarray(grid), dtype=positions.dtype)
    frac = positions / box
    frac = frac - jnp.floor(frac)
    ci = jnp.clip((frac * gvec).astype(jnp.int32), 0,
                  jnp.asarray(np.asarray(grid) - 1, dtype=jnp.int32))
    col = ci[:, 0] * gy + ci[:, 1]
    cz = ci[:, 2]

    scap = gz * capacity
    onehot_a = (col[:, None] == jnp.arange(ncol)[None, :]).astype(jnp.int32)
    cum_a = jnp.cumsum(onehot_a, axis=0)
    rank_a = jnp.sum(onehot_a * cum_a, axis=1) - 1       # no gather
    ok_a = rank_a < scap
    colslot = jnp.where(ok_a, col * scap + rank_a, ncol * scap)

    kz = 1 << max(int(gz - 1).bit_length(), 1)
    packed = jnp.arange(n, dtype=jnp.int32) * kz + cz
    staged = jnp.full((ncol * scap,), n * kz, jnp.int32)
    staged = staged.at[colslot].set(packed, mode="drop")
    sid = staged // kz
    scz = staged % kz
    valid = (sid < n).reshape(ncol, scap)

    onehot_b = ((scz.reshape(ncol, scap)[:, :, None]
                 == jnp.arange(gz)[None, None, :])
                & valid[:, :, None]).astype(jnp.int32)
    cum_b = jnp.cumsum(onehot_b, axis=1)
    rank_b = jnp.sum(onehot_b * cum_b, axis=2) - 1       # [ncol, scap]

    cell_flat = (jnp.arange(ncol, dtype=jnp.int32)[:, None] * gz
                 + scz.reshape(ncol, scap))
    ok_b = valid & (rank_b < capacity)
    sentinel = ncol * gz * capacity
    slot_of = jnp.where(ok_b, cell_flat * capacity + rank_b, sentinel)

    slots = jnp.full((sentinel,), n, jnp.int32)
    slots = slots.at[slot_of.ravel()].set(sid.reshape(-1), mode="drop")
    inv_slot = jnp.full((n,), sentinel, jnp.int32)
    inv_slot = inv_slot.at[sid.reshape(-1)].set(slot_of.ravel(), mode="drop")
    overflow = (jnp.sum(~ok_a) + jnp.sum(valid & (rank_b >= capacity))
                ).astype(jnp.int32)
    return slots.reshape(ncol * gz, capacity), inv_slot, overflow


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    force, pos, _, box = water_box(n_side=n_side, flux="bond_angle")
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell")
    cap = cells.suggest_capacity(pos, box, system.spec.cell_grid, margin=1.05)
    spec = system.spec
    grid = spec.cell_grid
    x = jnp.asarray(pos, jnp.float32)
    print(f"atoms={system.n_atoms} grid={grid} cap={cap}", file=sys.stderr)

    # correctness first (CPU-comparable on any backend)
    s1, i1, o1 = cells.build_cell_list_full(x, system.box, grid, cap)
    s2, i2, o2 = two_stage_bin(x, system.box, grid, cap)
    assert int(o1) == 0 and int(o2) == 0, (int(o1), int(o2))
    same_slots = bool(jnp.all(s1 == s2))
    same_inv = bool(jnp.all(i1 == i2))
    print(f"slots equal: {same_slots}  inv equal: {same_inv}")

    def timed(fn, label):
        @partial(jax.jit, static_argnums=(1,))
        def run(x0, k):
            def body(xx, _):
                slots, inv, ov = fn(xx, system.box, grid, cap)
                return xx + 0.0 * jnp.sum(slots % 7).astype(xx.dtype), \
                    ov.astype(xx.dtype)
            xk, es = jax.lax.scan(body, x0, None, length=k)
            return es[-1] + 0.0 * jnp.sum(xk)

        float(run(x, 3))
        float(run(x, 23))

        def t(k):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(run(x, k))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        ms = (t(23) - t(3)) / 20 * 1e3
        print(f"{label}: {ms:.3f} ms")
        return ms

    timed(cells.build_cell_list_full, "one-stage one-hot")
    timed(two_stage_bin, "two-stage hierarchical")


if __name__ == "__main__":
    main()
