"""A/B: concat pair tile (VPU elementwise) vs an MXU-offloaded variant.

Hypothesis: ~40% of the walk's VPU ops can ride the MXU instead —
  * r^2 built as |xi'|^2 + |xj'|^2 - 2 xi'.xj' with the cross term a
    batched [cap,3]x[3,14cap] matmul (coords are first re-centered on each
    i-cell's centroid so the difference-of-squares stays inside the f32
    budget: |x'| <= ~1.5 cell edges instead of the full box),
  * the gradient contractions as matmuls:
      gi = xi' * rowsum(w) - w @ xj',   gj = xj' * colsum(w) - w^T @ xi'
    (w = dE/dr / r per pair) instead of per-axis multiply+reduce.
The polynomial/LJ/mask chain stays on the VPU.  Risk: XLA materializing
w [*, cap, 14cap] into HBM to feed the dots instead of fusing — measure,
don't guess.

Usage: python tools/walk_mxu_ab.py [216|4k|30k]   (TPU)
"""

import json
import math
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan, build  # noqa: E402
from chargeflux_tpu import cells  # noqa: E402
from chargeflux_tpu.cells import CellBlocks, _concat_slabs, _concat_tile  # noqa: E402
from chargeflux_tpu.charges import effective_charges  # noqa: E402
from chargeflux_tpu.neighbors import build_neighbor_state  # noqa: E402
from chargeflux_tpu.ops.erfc import erf_over_r_eval  # noqa: E402
from chargeflux_tpu.units import ONE_4PI_EPS0  # noqa: E402

HIGHEST = jax.lax.Precision.HIGHEST


def mxu_tile(comp, qc, hc, sc, ids, xj, qj, hj, sj, idsj, system, centers,
             mxu_r2: bool = True):
    """MXU variant of cells._concat_tile (f32, with_grads=True path).

    ``mxu_r2=False`` is the hybrid: r^2 from explicit per-axis deltas on
    the VPU (exact, no re-centering needed) with only the gradient
    contractions as matmuls — separates the two offload decisions."""
    spec = system.spec
    cap = spec.cell_capacity
    n = system.n_atoms
    dtype = comp[0].dtype
    valid = ids < n
    mj = idsj < n
    alpha = spec.alpha
    cutoff2 = spec.cutoff * spec.cutoff

    # re-center on the i-cell centroid (same shift both sides: r unchanged)
    xi3 = jnp.stack([c - ctr for c, ctr in zip(comp, centers)], axis=-1)
    xj3 = jnp.stack([c - ctr for c, ctr in zip(xj, centers)], axis=-1)
    if mxu_r2:
        ni = jnp.sum(xi3 * xi3, axis=-1)
        nj = jnp.sum(xj3 * xj3, axis=-1)
        cross = jnp.einsum("...ik,...jk->...ij", xi3, xj3,
                           precision=HIGHEST)
        r2 = ni[..., :, None] + nj[..., None, :] - 2.0 * cross
    else:
        r2 = sum((a[..., :, None] - b[..., None, :]) ** 2
                 for a, b in zip(comp, xj))

    ordered = ((jnp.arange(xj3.shape[-2], dtype=jnp.int32) >= cap)
               | (ids[..., :, None] < idsj[..., None, :]))
    mask = valid[..., :, None] & mj[..., None, :] & (r2 < cutoff2) & ordered
    r2s = jnp.where(mask, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    qq = (ONE_4PI_EPS0 * qc[..., :, None]) * qj[..., None, :]
    p, dpds = erf_over_r_eval(r2s, alpha, spec.cutoff, with_derivative=True)
    kern = inv_r - p
    coul = qq * kern
    u = inv_r * inv_r
    dcoul_over_r = -qq * (u * inv_r + 2.0 * dpds)
    sig2 = ((hc[..., :, None] + hj[..., None, :]) * inv_r) ** 2
    sig6 = sig2 * sig2 * sig2
    epr = sc[..., :, None] * sj[..., None, :]
    lj = epr * sig6 * (sig6 - 1.0)
    e = jnp.sum(jnp.where(mask, coul + lj, 0.0))
    dlj_over_r = -epr * sig6 * (12.0 * sig6 - 6.0) * u
    w = jnp.where(mask, dcoul_over_r + dlj_over_r, 0.0)

    rows = jnp.sum(w, axis=-1)
    cols = jnp.sum(w, axis=-2)
    wxj = jnp.einsum("...ij,...jk->...ik", w, xj3, precision=HIGHEST)
    wtxi = jnp.einsum("...ij,...ik->...jk", w, xi3, precision=HIGHEST)
    gi3 = xi3 * rows[..., None] - wxj
    gj3 = xj3 * cols[..., None] - wtxi
    gi = [gi3[..., k] for k in range(3)]
    gj = [gj3[..., k] for k in range(3)]
    ec = jnp.where(mask, kern, 0.0) * ONE_4PI_EPS0
    dqi = jnp.sum(ec * qj[..., None, :], axis=-1)
    dqj = jnp.sum(ec * qc[..., :, None], axis=-2)
    return e, gi, gj, dqi, dqj


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "30k"
    x, system, _ = build(config)
    spec = system.spec
    gx, gy, gz = spec.cell_grid
    cap = spec.cell_capacity
    dtype = x.dtype
    nb = build_neighbor_state(x, system)
    q = effective_charges(x, system)
    blocks = cells.blockify(x, q, system, nb.slots, nb.inv_slot,
                            wrap=nb.wrap)
    ids = nb.slots.reshape(spec.cell_grid + (cap,))
    box = np.asarray(jax.device_get(system.box))
    ctr = [jnp.asarray(((np.arange(g) + 0.5) * box[a] / g), dtype).reshape(
        [-1 if i == a else 1 for i in range(3)] + [1])
        for a, g in enumerate((gx, gy, gz))]

    def run_variant(kind):
        def once(carry):
            xyz, qb = carry[:3], carry[3]
            b = CellBlocks(x=xyz[0], y=xyz[1], z=xyz[2], q=qb,
                           hs=blocks.hs, se=blocks.se)
            xj, qj, hj, sj, idsj = _concat_slabs(b, ids, system)
            comp = [b.x, b.y, b.z]
            if kind == "vpu":
                return _concat_tile(comp, b.q, b.hs, b.se, ids, xj, qj,
                                    hj, sj, idsj, system, True)
            return mxu_tile(comp, b.q, b.hs, b.se, ids, xj, qj, hj, sj,
                            idsj, system, ctr, mxu_r2=(kind == "mxu"))

        @partial(jax.jit, static_argnums=(1,))
        def run(carry0, k):
            def step(carry, _):
                e, gi, gj, dqi, dqj = once(carry)
                # every output feeds the carry (incl. q -> the q/h/s slab
                # concats stay INSIDE the loop; charges are x-dependent in
                # the real step, so hoisting them would under-measure —
                # BASELINE.md measurement rule 2)
                bump = 1e-26 * sum(jnp.sum(j) for j in gj)
                xyz2 = [a + 1e-22 * g + bump
                        for a, g in zip(carry[:3], gi)]
                q2 = carry[3] + 1e-26 * (dqi + jnp.sum(dqj))
                return xyz2 + [q2], e
            ck, es = jax.lax.scan(step, carry0, None, length=k)
            return es[-1] + 0.0 * sum(jnp.sum(a) for a in ck)

        carry0 = [blocks.x, blocks.y, blocks.z, blocks.q]
        return run, carry0, once

    # correctness: A vs B on the real config
    runA, xyz0, onceA = run_variant("vpu")
    runB, _, onceB = run_variant("mxu")
    eA, giA, _, dqA, _ = onceA(xyz0)
    eB, giB, _, dqB, _ = onceB(xyz0)
    scale = float(jnp.max(jnp.abs(giA[0])))
    print(json.dumps({
        "e_rel": float(abs(eA - eB) / abs(eA)),
        "g_rel": float(jnp.max(jnp.abs(giA[0] - giB[0])) / scale),
        "dq_rel": float(jnp.max(jnp.abs(dqA - dqB))
                        / float(jnp.max(jnp.abs(dqA)))),
    }))
    runH, _, _ = run_variant("hyb")
    for kind, run in (("vpu", runA), ("mxu", runB), ("hyb", runH)):
        ms = _timed_scan(run, xyz0, 2, 52, reps=5)
        print(json.dumps({"kind": kind, "config": config,
                          "ms_fused_tile": round(ms, 4)}))


if __name__ == "__main__":
    main()
