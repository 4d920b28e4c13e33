"""Mosaic (Pallas TPU) fused direct-space walk — the hot kernel.

Replaces the XLA roll-based fused walk (cells._roll_fused_walk) on the TPU
f32 path.  Same contract as the CUDA computeNonbonded kernel it out-designs
(PBCForce.cu:86-751): one pass over all in-cutoff pairs producing energy,
dE/dx and dE/dq together.

Why a hand kernel wins here (measured round-2 numbers in BASELINE.md):

* the XLA walk is VPU-bound at ~78.6M pair slots; its force/dedq
  accumulations (12+ VPU ops per slot) become MXU matmuls **against
  VMEM-resident tiles** — XLA cannot do this because a dot operand must be
  materialized to HBM (22 MB per slab), which costs more than the VPU ops
  it saves;
* cells bin atoms rank-contiguously, so fully-padded i-subtiles are skipped
  with a scalar `pl.when` guard — at 30k (cap 128, mean occupancy 93) this
  prunes ~25% of pair slots that XLA's static slabs must compute;
* the erfc/r polynomial (ops/erfc.py) runs as an unrolled FMA chain.

Layout: one program per cell **column** (cx, cy).  Fields are field-major
[8, gx+1, gy+2, gz+2, cap] with ghost layers carrying pre-shifted periodic
image coordinates, so the kernel sees only static neighbors:

    field order: x, y, z, sqrt(k)*q, 1.0, half_sigma, 2*sqrt(eps), atom_id

Per (i-z-cell, i-subtile, shift) tile [IS, cap]:

    TI[2*IS, 8]  = [W; ecm] @ J8^T      (j-weighted i-row sums, one dot)
    TJ[8, 2*cap] = A8^T @ [W | ecm]     (i-weighted j-col sums, one dot)

where W = masked dE/dr/r, ecm = masked erfc(ar)/r.  The XLA epilogue turns
TI/TJ into dE/dx and dE/dq per block slot:  gi = xi * TI[:,4] - TI[:,x],
gj = xj * TJ[4,:] - TJ[x,:], dqi/dqj from the q-weighted columns.  Within a
tile both sides are re-centered on the first i-atom's coordinates — the
pair deltas are unchanged (the same scalar cancels), but the MXU's
bf16-decomposed products then act on O(cell) magnitudes instead of O(box),
keeping the accumulation error ~1e-6 relative.

The custom_vjp lives in cells.direct_energy_on_blocks: this kernel is its
forward pass; the backward is a scale of the returned accumulators.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import ONE_4PI_EPS0
from .erfc import erf_over_r_coeffs

_HIGHEST = jax.lax.Precision.HIGHEST

# (input ref index, dz, is_self): ref 0 = (dx=0,dy=0), 1 = (0,+1),
# 2 = (1,-1), 3 = (1,0), 4 = (1,+1) — the half-shell as column pairs.
_SHIFTS = ((0, 0, True), (0, 1, False),
           (1, -1, False), (1, 0, False), (1, 1, False),
           (2, -1, False), (2, 0, False), (2, 1, False),
           (3, -1, False), (3, 0, False), (3, 1, False),
           (4, -1, False), (4, 0, False), (4, 1, False))

def _tile(a8c, j8c, idi, *, alpha, cutoff, n_atoms, is_self):
    """Pair math for one [IS, cap] tile.  a8c [IS, 8] centered i-fields,
    j8c [8, cap] centered j-fields.  Returns (W, ecm, epair) all [IS, cap]:
    masked dE/dr/r, masked erfc(ar)/r, masked pair energy."""
    xi, yi, zi = a8c[:, 0:1], a8c[:, 1:2], a8c[:, 2:3]
    qi, hi, si = a8c[:, 3:4], a8c[:, 5:6], a8c[:, 6:7]
    xj, yj, zj = j8c[0:1, :], j8c[1:2, :], j8c[2:3, :]
    qj, hj, sj = j8c[3:4, :], j8c[5:6, :], j8c[6:7, :]
    idj = j8c[7:8, :]

    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    r2 = dx * dx + dy * dy + dz * dz
    cut2 = cutoff * cutoff
    nf = float(n_atoms)
    mask = (r2 < cut2) & (idi < nf) & (idj < nf)
    if is_self:
        mask = mask & (idi < idj)
    r2s = jnp.where(mask, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    u = inv_r * inv_r

    # erfc(ar)/r = 1/r - P(r^2); dP/d(r^2) by dual-number Horner.
    coeffs = erf_over_r_coeffs(alpha, cutoff)
    ws = 2.0 / cut2
    w = r2s * ws - 1.0
    p = coeffs[-1]
    d = 0.0
    for ck in coeffs[-2::-1]:
        d = d * w + p
        p = p * w + ck
    kern = inv_r - p
    qq = qi * qj                               # k folded: q-fields are sqrt(k)q
    coul = qq * kern
    dcoul = -qq * (u * inv_r + (2.0 * ws) * d)

    sig2 = (hi + hj) ** 2 * u
    sig6 = sig2 * sig2 * sig2
    p6 = (si * sj) * sig6
    lj = p6 * (sig6 - 1.0)
    dlj = -p6 * (12.0 * sig6 - 6.0) * u

    wmat = jnp.where(mask, dcoul + dlj, 0.0)
    ecm = jnp.where(mask, kern, 0.0)
    epair = jnp.where(mask, coul + lj, 0.0)
    return wmat, ecm, epair


def _walk_kernel(nsub_ref, c00, c01, c1m, c10, c11,
                 e_ref, gi_ref, gj_ref, t8_ref,
                 *, gz, cap, isub, ksub, alpha, cutoff, n_atoms):
    """Outputs: e_ref [1, IS, cap] masked pair-energy partials;
    gi_ref [1, gz, cap, 8] with lanes (gix, giy, giz, dqi~, 0...);
    gj_ref [1, 5, gz+2, 8, cap] with sublanes (gjx, gjy, gjz, dqj~, 0...).
    dqi~/dqj~ carry sqrt(k)-scaled charges; the XLA epilogue rescales."""
    pid = pl.program_id(0)
    refs = (c00, c01, c1m, c10, c11)

    e_ref[...] = jnp.zeros_like(e_ref)
    gi_ref[...] = jnp.zeros_like(gi_ref)
    gj_ref[...] = jnp.zeros_like(gj_ref)

    # re-centering touches the x/y/z fields only (no captured constants:
    # Pallas kernels must build arrays in-body)
    cmask = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) < 3).astype(
        jnp.float32)

    def zi_body(zi, _):
        # stage the transposed i-cell in scratch: lane-dim slicing must be
        # 128-aligned, sublane slicing need not be
        t8_ref[...] = jnp.transpose(c00[:, 0, 0, zi + 1, :])

        def k_body(k, _):
            @pl.when(k < nsub_ref[pid, zi])
            def _():
                a8 = t8_ref[pl.ds(pl.multiple_of(k * isub, isub), isub), :]
                crow = a8[0:1, :] * cmask               # recenter on atom 0
                a8c = a8 - crow
                ccol = jnp.transpose(crow) * cmask.reshape(8, 1)
                idi = a8[:, 7:8]
                ti = jnp.zeros((2 * isub, 8), jnp.float32)
                for (ri, dz, is_self) in _SHIFTS:
                    j8c = refs[ri][:, 0, 0, zi + 1 + dz, :] - ccol
                    wmat, ecm, epair = _tile(
                        a8c, j8c, idi, alpha=alpha, cutoff=cutoff,
                        n_atoms=n_atoms, is_self=is_self)
                    e_ref[0, :, :] = e_ref[0, :, :] + epair
                    l2 = jnp.concatenate([wmat, ecm], axis=0)
                    ti = ti + jax.lax.dot_general(
                        l2, j8c, (((1,), (1,)), ((), ())),
                        precision=_HIGHEST,
                        preferred_element_type=jnp.float32)
                    l2c = jnp.concatenate([wmat, ecm], axis=1)
                    tj = jax.lax.dot_general(
                        a8c, l2c, (((0,), (0,)), ((), ())),
                        precision=_HIGHEST,
                        preferred_element_type=jnp.float32)
                    # j-side epilogue (per tile: the recentering constant
                    # must match): gj_c = xj_c * sum_i W - sum_i W*xi_c
                    sw = tj[4:5, 0:cap]                 # sum_i W per column
                    gj8 = jnp.concatenate(
                        [j8c[0:3, :] * sw - tj[0:3, 0:cap],
                         tj[3:4, cap:],                 # dqj~ = sum ecm*qi~
                         jnp.zeros((4, cap), jnp.float32)], axis=0)
                    zj = zi + 1 + dz
                    gj_ref[0, ri, zj, :, :] = gj_ref[0, ri, zj, :, :] + gj8
                # i-side epilogue: gi_c = xi_c * sum_j W - sum_j W*xj_c
                sw = ti[0:isub, 4:5]
                gi8 = jnp.concatenate(
                    [a8c[:, 0:3] * sw - ti[0:isub, 0:3],
                     ti[isub:, 3:4],                    # dqi~ = sum ecm*qj~
                     jnp.zeros((isub, 4), jnp.float32)], axis=1)
                gi_ref[0, zi, pl.ds(k * isub, isub), :] = (
                    gi_ref[0, zi, pl.ds(k * isub, isub), :] + gi8)

            return None

        jax.lax.fori_loop(0, ksub, k_body, None)
        return None

    jax.lax.fori_loop(0, gz, zi_body, None)


def _pick_isub(cap: int) -> int:
    for s in (32, 16, 8):
        if cap % s == 0:
            return s
    raise ValueError(f"cell capacity {cap} not a multiple of 8")


def mosaic_walk_applicable(spec, dtype) -> bool:
    return (dtype == jnp.float32 and jax.default_backend() == "tpu"
            and spec.cell_capacity % 8 == 0 and min(spec.cell_grid) >= 3)


# column pairs matching _SHIFTS ref indices 0..4
_COLS = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))


def mosaic_fused_walk(blocks, ids, system):
    """Direct-space energy + dE/dx + dE/dq over cell blocks via the Mosaic
    kernel.  Same return contract as cells._roll_fused_walk:
    (energy, [gx, gy, gz] block gradients, dq block gradient).

    Rejected variant (measured, see BASELINE.md): staging all 14 shift
    tiles into one [8, 14*cap] VMEM panel and collapsing the 28 small
    per-shift dots into 4 wide ones ran 1.4x SLOWER (3.07 vs 2.20 ms at
    30k) — the [3*IS, 14*cap] scratch read-modify-write traffic costs more
    than the small dots it removes; the per-shift [IS, cap] working set
    pipelines better."""
    spec = system.spec
    gx, gy, gz = spec.cell_grid
    cap = spec.cell_capacity
    n = system.n_atoms
    box = system.box
    isub = _pick_isub(cap)
    ksub = cap // isub
    sqk = math.sqrt(ONE_4PI_EPS0)
    ncol = gx * gy

    idf = ids.astype(jnp.float32)          # exact for n < 2^24
    f = jnp.stack([blocks.x, blocks.y, blocks.z, sqk * blocks.q,
                   jnp.ones_like(blocks.x), blocks.hs, blocks.se, idf],
                  axis=0)                  # [8, gx, gy, gz, cap]

    # ghost layers with pre-shifted periodic image coordinates — the kernel
    # then sees only static neighbor offsets (no wrap logic on device).
    ghx = f[:, 0:1].at[0].add(box[0])
    f = jnp.concatenate([f, ghx], axis=1)                  # [8, gx+1, ...]
    gylo = f[:, :, -1:].at[1].add(-box[1])
    gyhi = f[:, :, 0:1].at[1].add(box[1])
    f = jnp.concatenate([gylo, f, gyhi], axis=2)           # [8, ., gy+2, .]
    gzlo = f[:, :, :, -1:].at[2].add(-box[2])
    gzhi = f[:, :, :, 0:1].at[2].add(box[2])
    fp = jnp.concatenate([gzlo, f, gzhi], axis=3)          # [8,.,.,gz+2,cap]

    occ = jnp.sum(ids < n, axis=-1).astype(jnp.int32)
    nsub = ((occ + isub - 1) // isub).reshape(ncol, gz)

    def col_in(dx, dy):
        return pl.BlockSpec(
            (8, 1, 1, gz + 2, cap),
            lambda p, ns, dx=dx, dy=dy: (0, p // gy + dx, p % gy + dy + 1,
                                         0, 0),
            memory_space=pltpu.VMEM)

    def out_spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda p, ns, nd=nd: (p,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    scratch = [pltpu.VMEM((cap, 8), jnp.float32)]
    e_shape = (isub, cap)
    kernel = functools.partial(
        _walk_kernel, gz=gz, cap=cap, isub=isub, ksub=ksub,
        alpha=float(spec.alpha), cutoff=float(spec.cutoff), n_atoms=n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncol,),
        in_specs=[col_in(dx, dy) for dx, dy in _COLS],
        out_specs=[out_spec(e_shape),
                   out_spec((gz, cap, 8)),
                   out_spec((5, gz + 2, 8, cap))],
        scratch_shapes=scratch,
    )
    e_parts, gi, gj = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ncol,) + e_shape, jnp.float32),
                   jax.ShapeDtypeStruct((ncol, gz, cap, 8), jnp.float32),
                   jax.ShapeDtypeStruct((ncol, 5, gz + 2, 8, cap),
                                        jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(nsub, fp, fp, fp, fp, fp)

    energy = jnp.sum(e_parts)

    gi5 = gi.reshape(gx, gy, gz, cap, 8)

    # fold the j-side partials: place each shift's slab at its column, then
    # wrap the ghost layers back onto the interior (all static slices).
    gj6 = gj.reshape(gx, gy, 5, gz + 2, 4 + 4, cap)[:, :, :, :, :4, :]
    pad = jnp.zeros((gx + 1, gy + 2, gz + 2, 4, cap), jnp.float32)
    for ri, (dx, dy) in enumerate(_COLS):
        pad = pad.at[dx:dx + gx, 1 + dy:1 + gy + dy].add(gj6[:, :, ri])
    # x ghost row gx is the image of x = 0
    core = pad[:gx].at[0].add(pad[gx])
    # y ghosts: col 0 = image of y = gy-1, col gy+1 = image of y = 0
    core = core[:, 1:gy + 1].at[:, gy - 1].add(core[:, 0]).at[:, 0].add(
        core[:, gy + 1])
    # z ghosts likewise
    core = core[:, :, 1:gz + 1].at[:, :, gz - 1].add(
        core[:, :, 0]).at[:, :, 0].add(core[:, :, gz + 1])
    # core [gx, gy, gz, 4, cap] -> per-slot layout [gx, gy, gz, cap]
    gjx = jnp.moveaxis(core, 3, -1)                   # [gx,gy,gz,cap,4]

    g_acc = [gi5[..., c] + gjx[..., c] for c in range(3)]
    dq_acc = (gi5[..., 3] + gjx[..., 3]) * sqk
    return energy, g_acc, dq_acc
