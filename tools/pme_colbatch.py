"""A/B the PME spread kernel's per-program column batch (cb) at the 30k
bench shapes: 64 single-column programs may be per-program-overhead bound
(bwd measures ~8x its arithmetic ideal).  Times spread_columns fwd+bwd on
prebuilt weights for cb in {1, 2, 4}, same process, 50-step scan diffs.

An earlier cb=7 variant measured 0.54 vs 0.46 ms (VMEM pressure); this
sweeps the small-cb range that earlier experiment skipped.
"""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan, build  # noqa: E402
from chargeflux_tpu import cells  # noqa: E402
from chargeflux_tpu.charges import effective_charges  # noqa: E402
from chargeflux_tpu.neighbors import build_neighbor_state  # noqa: E402
from chargeflux_tpu.ops.pallas_pme import spread_columns  # noqa: E402
from chargeflux_tpu.pme import _patch_origins, _patch_width, bspline  # noqa: E402


def build_inputs():
    x, system, _ = build("30k")
    spec = system.spec
    nb = build_neighbor_state(x, system)
    q = effective_charges(x, system)
    blocks = cells.blockify(x, q, system, nb.slots, nb.inv_slot, wrap=nb.wrap)
    ids = nb.slots.reshape(spec.cell_grid + (spec.cell_capacity,))

    dtype = jnp.float32
    box = system.box
    order = spec.pme_order
    ngx, ngy, ngz = spec.cell_grid
    gx, gy, gz = spec.pme_grid
    cap = blocks.x.shape[-1]
    n = system.n_atoms
    qv = jnp.where(ids < n, blocks.q, 0.0)

    def compact_t(coord, n_cells, grid_n, length, cell_axis):
        extra = spec.pme_slack[cell_axis]
        u = coord * (grid_n / length)
        org = _patch_origins(n_cells, grid_n, order, extra)
        w = _patch_width(n_cells, grid_n, order, extra)
        shape = [1, 1, 1, 1, 1]
        shape[cell_axis] = n_cells
        base = jnp.asarray(org, dtype).reshape(shape)
        j = jnp.arange(w, dtype=dtype).reshape(1, 1, w, 1, 1)
        t = u[:, :, None, :, :] - (base + j)
        return bspline(t, order), org + order + extra, w

    wlxt, opx, wx = compact_t(blocks.x, ngx, gx, box[0], 0)
    wlyt5, opy, wy = compact_t(blocks.y, ngy, gy, box[1], 1)
    uz = blocks.z * (gz / box[2])
    org_f = jnp.floor(uz) - (order - 1)
    tzk = (uz - org_f)[:, :, None, :, :] - jnp.arange(
        order, dtype=dtype).reshape(1, 1, order, 1, 1)
    wzt5 = bspline(tzk, order)
    zorg = jnp.mod(org_f, gz).astype(jnp.int32)

    n_col = ngx * ngy
    rows = ngz * cap
    wyp = -(-wy // 8) * 8
    qwlxt = (qv[:, :, None] * wlxt).reshape(n_col, wx, rows)
    wlyt = wlyt5.reshape(n_col, wy, rows)
    wlyt = jnp.pad(wlyt, ((0, 0), (0, wyp - wy), (0, 0)))
    offsets = (tuple(int(opx[c // ngy]) for c in range(n_col)),
               tuple(int(opy[c % ngy]) for c in range(n_col)))
    pad_xy = (int(opx.max()) + wx, int(opy.max()) + wyp, gz)
    wzt = wzt5.reshape(n_col, order, rows)
    zg = zorg.reshape(n_col, 1, rows)
    return (jax.lax.stop_gradient(qwlxt), jax.lax.stop_gradient(wlyt),
            jax.lax.stop_gradient(wzt), jax.device_get(zg), offsets, pad_xy)


def main():
    qwlxt, wlyt, wzt, zg, offsets, pad_xy = build_inputs()
    zg = jnp.asarray(zg)

    def make_run(cb):
        def loss(a, b, c):
            out = spread_columns(a, b, c, zg, offsets, pad_xy, cb)
            return jnp.sum(out * out)

        def step(carry, _):
            a, b, c = carry
            v, (da, db, dc) = jax.value_and_grad(loss, (0, 1, 2))(a, b, c)
            eps = 1e-30
            return (a + eps * da, b + eps * db, c + eps * dc), v

        @partial(jax.jit, static_argnums=(1,))
        def run(init, k):
            carry, vs = jax.lax.scan(step, init, None, length=k)
            return vs[-1] + 0.0 * sum(jnp.sum(t) for t in carry)
        return run

    runs = {cb: make_run(cb) for cb in (4, 8)}
    init = (qwlxt, wlyt, wzt)
    for cb, run in runs.items():
        t0 = time.time()
        float(run(init, 2))
        print(f"# cb={cb} compiled in {time.time()-t0:.0f}s", flush=True)
    t_end = time.time() + 8.0
    while time.time() < t_end:
        float(next(iter(runs.values()))(init, 12))
    res = {cb: [] for cb in runs}
    for _ in range(6):
        for cb, run in runs.items():
            res[cb].append(_timed_scan(run, init, 2, 202, reps=1,
                                       warm_s=0.5))
    for cb in runs:
        print(json.dumps({"cb": cb,
                          "ms": round(float(np.median(res[cb])), 4),
                          "all": [round(v, 4) for v in res[cb]]}),
              flush=True)


if __name__ == "__main__":
    main()
