"""Pallas TPU kernel for the direct-space pair sum (erfc Coulomb + LJ).

The hand kernel of this engine (SURVEY §7 step 5) — the TPU replacement for
the reference's CUDA warp-tile ``computeNonbonded`` (PBCForce.cu:86-751).

Design:

* **Cell-major layout, prepared outside**: XLA gathers positions/params into
  [C, cap] cell-major planes (x/y/z as separate arrays — a trailing dim of 3
  would pad to 128 lanes) and [27, C, cap] neighbor slabs with periodic
  image shifts already applied (static per (cell, shift) offsets) and i-cell
  centers subtracted (f32 accuracy).  The kernel sees only dense, statically
  shaped VMEM blocks — no gathers, no atomics, no min-image floor in the hot
  loop.
* **Full-shell symmetric traversal**: each cell accumulates energy (x 0.5)
  and *complete* forces/dedq for its own atoms from all 27 neighbor slabs —
  force output lands in the i-block, so the backward pass needs no j-side
  scatter (the TPU answer to the CUDA fixed-point force atomics,
  PBCForce.cu:336-349).
* **custom_vjp**: forward = energy kernel; backward = one force+dedq kernel
  pass using the analytic derivative of the same erfc polynomial, so the
  force is the exact gradient of the computed energy.  The chain rule
  through q(x) stays with outer autodiff.

dedq semantics match ReferenceCoulKernels.cpp:588-589 (direct-space part).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import ONE_4PI_EPS0

# Abramowitz & Stegun 7.1.26 erfc polynomial (see ops/erfc.py); the backward
# kernel uses its exact analytic derivative.
_P = 0.3275911
_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def full_shell_tables(grid):
    """Static [C, 27] neighbor ids and [C, 27, 3] image offsets (box units)."""
    gx, gy, gz = grid
    ids = np.arange(gx * gy * gz)
    cx, cy, cz = ids // (gy * gz), (ids // gz) % gy, ids % gz
    nbr, off = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nx, ny, nz = cx + dx, cy + dy, cz + dz
                nbr.append(((nx % gx) * gy + ny % gy) * gz + nz % gz)
                off.append(np.stack([nx // gx, ny // gy, nz // gz], axis=-1))
    return (np.stack(nbr, axis=1).astype(np.int32),
            np.stack(off, axis=1).astype(np.int8))


def _erfc_poly(x):
    t = 1.0 / (1.0 + _P * x)
    a1, a2, a3, a4, a5 = _A
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return poly * jnp.exp(-x * x), t


# Kernel argument order (i-side then one neighbor slab per grid step):
#   xi, yi, zi, qi, hsi, sei, idi            [BC, cap]
#   xn, yn, zn, qn, hsn, sen, idn            [1, BC, cap]  (shift s slab)
# The 27 shifts form the second (innermost) grid dimension; output blocks
# are revisited across it and accumulated (init at s == 0).
_N_IN = 14


def _pair_core(refs, alpha, cutoff2, n_atoms):
    """Pair quantities between the i-block and the current shift's slab."""
    xi, yi, zi, qi, hsi, sei, idi, xn, yn, zn, qn, hsn, sen, idn = refs
    dx = xi[:][:, :, None] - xn[0][:, None, :]
    dy = yi[:][:, :, None] - yn[0][:, None, :]
    dz = zi[:][:, :, None] - zn[0][:, None, :]
    r2 = dx * dx + dy * dy + dz * dz
    idj = idn[0]
    mask = ((idi[:][:, :, None] != idj[:, None, :])
            & (idi[:][:, :, None] < n_atoms)
            & (idj[:, None, :] < n_atoms)
            & (r2 < cutoff2))
    r2s = jnp.where(mask, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    r = r2s * inv_r
    erfc_ar, t = _erfc_poly(alpha * r)
    qq = (qi[:][:, :, None] * qn[0][:, None, :]) * ONE_4PI_EPS0
    sig2 = ((hsi[:][:, :, None] + hsn[0][:, None, :]) * inv_r) ** 2
    sig6 = sig2 * sig2 * sig2
    epr = sei[:][:, :, None] * sen[0][:, None, :]
    return dx, dy, dz, mask, inv_r, r, erfc_ar, t, qq, sig6, epr


def _energy_kernel(*args, alpha, cutoff2, n_atoms):
    refs, out_e = args[:_N_IN], args[_N_IN]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_e[:, :] = jnp.zeros_like(out_e)

    (_, _, _, mask, inv_r, _, erfc_ar, _, qq, sig6, epr) = _pair_core(
        refs, alpha, cutoff2, n_atoms)
    e = qq * inv_r * erfc_ar + epr * sig6 * (sig6 - 1.0)
    part = 0.5 * jnp.sum(jnp.where(mask, e, 0.0), axis=2)   # [BC, cap]
    out_e[:, :] = out_e[:, :] + jnp.sum(part, axis=1, keepdims=True)


def _fused_kernel(*args, alpha, cutoff2, n_atoms):
    """One pass: per-cell energy, dE/dx_i (three planes), and dE/dq_i.

    MD always needs energy *and* forces; fusing them avoids walking the pair
    blocks twice (the CUDA kernel does the same, PBCForce.cu:86-751)."""
    refs = args[:_N_IN]
    out_e, out_gx, out_gy, out_gz, out_dq = args[_N_IN:_N_IN + 5]
    qn = refs[10]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_e[:, :] = jnp.zeros_like(out_e)
        out_gx[:, :] = jnp.zeros_like(out_gx)
        out_gy[:, :] = jnp.zeros_like(out_gy)
        out_gz[:, :] = jnp.zeros_like(out_gz)
        out_dq[:, :] = jnp.zeros_like(out_dq)

    (dx, dy, dz, mask, inv_r, r, erfc_ar, t, qq, sig6, epr) = _pair_core(
        refs, alpha, cutoff2, n_atoms)
    coul = qq * inv_r * erfc_ar
    lj = epr * sig6 * (sig6 - 1.0)
    e_blk = jnp.where(mask, coul + lj, 0.0)
    out_e[:, :] = out_e[:, :] + 0.5 * jnp.sum(
        jnp.sum(e_blk, axis=2), axis=1, keepdims=True)

    a1, a2, a3, a4, a5 = _A
    x = alpha * r
    polyp = a1 + t * (2 * a2 + t * (3 * a3 + t * (4 * a4 + t * 5 * a5)))
    # erfcP'(x) = -p t^2 poly'(t) e^{-x^2} - 2 x erfcP(x)
    derfc = -_P * t * t * polyp * jnp.exp(-x * x) - 2.0 * x * erfc_ar
    dcoul_dr = (qq * derfc * alpha - coul) * inv_r
    dlj_dr = -epr * sig6 * (12.0 * sig6 - 6.0) * inv_r
    dEdr_over_r = jnp.where(mask, (dcoul_dr + dlj_dr) * inv_r, 0.0)
    out_gx[:, :] = out_gx[:, :] + jnp.sum(dEdr_over_r * dx, axis=2)
    out_gy[:, :] = out_gy[:, :] + jnp.sum(dEdr_over_r * dy, axis=2)
    out_gz[:, :] = out_gz[:, :] + jnp.sum(dEdr_over_r * dz, axis=2)
    dq_pair = jnp.where(
        mask, ONE_4PI_EPS0 * qn[0][:, None, :] * inv_r * erfc_ar, 0.0)
    out_dq[:, :] = out_dq[:, :] + jnp.sum(dq_pair, axis=2)


def _choose_block_cells(n_cells: int, cap: int, vmem_bytes: int) -> int:
    """Cells per program: multiple of 8 (Mosaic sublane constraint on the
    [BC, cap] blocks) such that one [BC, cap, cap] f32 intermediate fits in
    ``vmem_bytes`` — the kernels keep a handful of such blocks live, so this
    budget is a fraction of the 16 MB VMEM.  Cell arrays are padded up to a
    multiple of the block size."""
    budget = max(1, vmem_bytes // max(cap * cap * 4, 1))
    bc = max(8, (min(n_cells, budget) // 8) * 8)
    return bc


def make_pallas_direct(system):
    """Build direct_energy(positions, q) -> scalar for this system's static
    spec, with a hand-written VJP.  f32; cell grid from system.spec."""
    spec = system.spec
    grid = spec.cell_grid
    cap = spec.cell_capacity
    n = system.n_atoms
    gx_, gy_, gz_ = grid
    n_cells = gx_ * gy_ * gz_
    nbr_np, off_np = full_shell_tables(grid)
    bc = _choose_block_cells(n_cells, cap, 512 * 1024)
    n_blocks = -(-n_cells // bc)
    c_pad = n_blocks * bc
    # Pad the static tables; padded rows carry sentinel slots (masked out).
    nbr_np = np.concatenate(
        [nbr_np, np.zeros((c_pad - n_cells, 27), np.int32)], axis=0)
    off_np = np.concatenate(
        [off_np, np.zeros((c_pad - n_cells, 27, 3), np.int8)], axis=0)
    interpret = jax.default_backend() != "tpu"
    kconst = dict(alpha=float(spec.alpha),
                  cutoff2=float(spec.cutoff * spec.cutoff), n_atoms=n)

    from ..cells import build_cell_list

    def _prep(positions, q):
        """Cell-major planes + neighbor slabs with image shifts applied."""
        box = system.box
        dtype = positions.dtype
        pos_w = positions - box * jnp.floor(positions / box)
        slots, _ = build_cell_list(positions, box, grid, cap)   # [C, cap]
        slots = jnp.concatenate(
            [slots, jnp.full((c_pad - n_cells, cap), n, jnp.int32)], axis=0)

        pad = lambda a, fill: jnp.concatenate(
            [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
        pos_p = pad(pos_w, 0.0)
        q_p = pad(q, 0.0)
        hs_p = pad(0.5 * system.sigma.astype(dtype), 0.0)
        se_p = pad(2.0 * jnp.sqrt(system.epsilon.astype(dtype)), 0.0)

        ids = np.minimum(np.arange(c_pad), n_cells - 1)
        coords = np.stack([ids // (gy_ * gz_), (ids // gz_) % gy_,
                           ids % gz_], -1)
        centers = (jnp.asarray(coords, dtype) + 0.5) * (
            box / jnp.asarray(np.array(grid), dtype))            # [C, 3]

        pc = pos_p[slots] - centers[:, None, :]                  # [C, cap, 3]
        i_side = (pc[..., 0], pc[..., 1], pc[..., 2],
                  q_p[slots], hs_p[slots], se_p[slots], slots)

        nbr = jnp.asarray(nbr_np)                                # [C, 27]
        j_slots = slots[nbr]                                     # [C, 27, cap]
        shift = jnp.asarray(off_np, dtype) * box                 # [C, 27, 3]
        pn = (pos_p[j_slots] + shift[:, :, None, :]
              - centers[:, None, None, :])                       # [C,27,cap,3]
        sm = lambda a: jnp.transpose(a, (1, 0, 2))               # -> [27,C,cap]
        n_side = (sm(pn[..., 0]), sm(pn[..., 1]), sm(pn[..., 2]),
                  sm(q_p[j_slots]), sm(hs_p[j_slots]), sm(se_p[j_slots]),
                  sm(j_slots))
        return slots, i_side + n_side

    def _specs():
        bi = pl.BlockSpec((bc, cap), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM)
        bn = pl.BlockSpec((1, bc, cap), lambda i, s: (s, i, 0),
                          memory_space=pltpu.VMEM)
        return [bi] * 7 + [bn] * 7

    _grid = (n_blocks, 27)
    _dimsem = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))

    def _energy_impl(args):
        e_cells = pl.pallas_call(
            partial(_energy_kernel, **kconst),
            grid=_grid,
            in_specs=_specs(),
            out_specs=pl.BlockSpec((bc, 1), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),
            compiler_params=_dimsem,
            interpret=interpret,
        )(*args)
        return jnp.sum(e_cells)

    def _fused_impl(args):
        plane = lambda: jax.ShapeDtypeStruct((c_pad, cap), jnp.float32)
        bi = lambda: pl.BlockSpec((bc, cap), lambda i, s: (i, 0),
                                  memory_space=pltpu.VMEM)
        be = pl.BlockSpec((bc, 1), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_fused_kernel, **kconst),
            grid=_grid,
            in_specs=_specs(),
            out_specs=[be, bi(), bi(), bi(), bi()],
            out_shape=[jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),
                       plane(), plane(), plane(), plane()],
            compiler_params=_dimsem,
            interpret=interpret,
        )(*args)

    @jax.custom_vjp
    def direct_energy(positions, q):
        _, args = _prep(positions, q)
        return _energy_impl(args)

    def _fwd(positions, q):
        # Fused pass: energy + dE/dx + dE/dq in one pair-block walk; the
        # gradients become residuals so the backward pass is a scatter+scale.
        slots, args = _prep(positions, q)
        e_cells, ggx, ggy, ggz, dq_cell = _fused_impl(args)
        flat = slots.reshape(-1)
        g_flat = jnp.stack(
            [ggx.reshape(-1), ggy.reshape(-1), ggz.reshape(-1)], axis=-1)
        x_bar = jnp.zeros_like(positions).at[flat].add(g_flat, mode="drop")
        q_bar = jnp.zeros_like(q).at[flat].add(dq_cell.reshape(-1),
                                               mode="drop")
        return jnp.sum(e_cells), (x_bar, q_bar)

    def _bwd(res, g_out):
        x_bar, q_bar = res
        return g_out * x_bar, g_out * q_bar

    direct_energy.defvjp(_fwd, _bwd)
    return direct_energy
