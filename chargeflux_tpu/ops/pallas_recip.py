"""Pallas TPU kernel for Ewald structure factors.

The XLA path (ewald.structure_factors) materializes the combined phase
tables cxy/sxy of shape [N, Kx*Ky] (hundreds of MB at 30k+ atoms) and
streams them through the MXU.  This kernel builds those tiles *in VMEM* from
the tiny per-axis tables and contracts them immediately:

    for each atom tile (grid dim, accumulated):
        cxy_tile [Kx*Ky, bn] = cx ⊗ cy - sx ⊗ sy      (VPU broadcast)
        sxy_tile [Kx*Ky, bn] = sx ⊗ cy + cx ⊗ sy
        A += cxy_tile @ zq_tile                        (MXU)
        B += sxy_tile @ zq_tile

where zq = q[:, None] * [cos_z | sin_z] (the charge folded into the smallest
table).  HBM traffic drops from O(N * Kx * Ky) to O(N * (Kx + Ky + 2 Kz)).

The backward pass is a second kernel: given cotangents of (A, B), it
recomputes the tiles, forms G = Ā @ zqᵀ / B̄ @ zqᵀ on the MXU, reduces over
ky/kx for the per-axis table cotangents, and contracts for d zq — all per
atom tile, never materializing [N, Kx*Ky].

Used via ewald.structure_factors(..., method="pallas"); numerics match the
XLA path to f32 roundoff (tests/test_pallas_recip.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(cx, sx, cy, sy, zq, a_out, b_out, *, kx, ky, kxy_pad):
    nt = pl.program_id(0)

    @pl.when(nt == 0)
    def _():
        a_out[:, :] = jnp.zeros_like(a_out)
        b_out[:, :] = jnp.zeros_like(b_out)

    # tiles: cx/sx [Kx, bn]; cy/sy [Ky, bn]; zq [bn, 2Kz]
    cxy = (cx[:][:, None, :] * cy[:][None, :, :]
           - sx[:][:, None, :] * sy[:][None, :, :]).reshape(kx * ky, -1)
    sxy = (sx[:][:, None, :] * cy[:][None, :, :]
           + cx[:][:, None, :] * sy[:][None, :, :]).reshape(kx * ky, -1)
    pad = kxy_pad - kx * ky
    if pad:
        cxy = jnp.pad(cxy, ((0, pad), (0, 0)))
        sxy = jnp.pad(sxy, ((0, pad), (0, 0)))
    a_out[:, :] += jnp.dot(cxy, zq[:], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    b_out[:, :] += jnp.dot(sxy, zq[:], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)


def _bwd_tables_kernel(cx, sx, cy, sy, zq, abar, bbar,
                       dcx, dsx, dcy, dsy, *, kx, ky, kxy_pad):
    """Cotangents of the per-axis phase tables (VMEM-lean half of the VJP)."""
    cxv, sxv = cx[:], sx[:]                       # [Kx, bn]
    cyv, syv = cy[:], sy[:]                       # [Ky, bn]
    bn = cxv.shape[-1]

    # dL/dcxy = A-bar @ zq^T ; dL/dsxy = B-bar @ zq^T      [Kxy_pad, bn]
    gc = jax.lax.dot_general(abar[:], zq[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    gs = jax.lax.dot_general(bbar[:], zq[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    gc3 = gc[:kx * ky].reshape(kx, ky, bn)
    gs3 = gs[:kx * ky].reshape(kx, ky, bn)

    dcx[:, :] = jnp.sum(gc3 * cyv[None, :, :] + gs3 * syv[None, :, :], axis=1)
    dsx[:, :] = jnp.sum(-gc3 * syv[None, :, :] + gs3 * cyv[None, :, :], axis=1)
    dcy[:, :] = jnp.sum(gc3 * cxv[:, None, :] + gs3 * sxv[:, None, :], axis=0)
    dsy[:, :] = jnp.sum(-gc3 * sxv[:, None, :] + gs3 * cxv[:, None, :], axis=0)


def _bwd_zq_kernel(cx, sx, cy, sy, abar, bbar, dzq, *, kx, ky, kxy_pad):
    """Cotangent of the charge-folded z table: dzq = cxy^T A-bar + sxy^T B-bar."""
    cxv, sxv = cx[:], sx[:]
    cyv, syv = cy[:], sy[:]
    bn = cxv.shape[-1]
    pad = kxy_pad - kx * ky

    def pad2(t):
        return jnp.pad(t.reshape(kx * ky, bn), ((0, pad), (0, 0))) if pad \
            else t.reshape(kx * ky, bn)

    cxy = pad2(cxv[:, None, :] * cyv[None, :, :]
               - sxv[:, None, :] * syv[None, :, :])
    sxy = pad2(sxv[:, None, :] * cyv[None, :, :]
               + cxv[:, None, :] * syv[None, :, :])
    dzq[:, :] = (
        jax.lax.dot_general(cxy, abar[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        + jax.lax.dot_general(sxy, bbar[:], (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST))


def make_structure_factor_fn(kmax, n_atoms: int, block_n: int = 128):
    """Build sf(cxT, sxT, cyT, syT, zq) -> (A, B) with a hand-written VJP.

    Table layouts: cxT/sxT [Kx, N], cyT/syT [Ky, N], zq [N, 2*Kz] with the
    charge folded in.  A/B are [Kx*Ky, 2*Kz] (cos/sin atom contractions);
    the caller assembles s_cos/s_sin.  N is padded to block_n internally by
    the caller (zero q rows contribute nothing).
    """
    kmx, kmy, kmz = kmax
    kx = kmx                      # nx in [0, kmax)
    ky_real = 2 * kmy - 1
    # ky padded to a sublane multiple: the in-kernel (kx, ky, bn) ->
    # (kx*ky, bn) reshape is free only when ky % 8 == 0 (zero-padded table
    # rows produce zero tile rows and zero structure-factor rows).
    ky = _ceil_to(ky_real, 8)
    kz2 = 2 * (2 * kmz - 1)
    kxy = kx * ky
    kxy_pad = kxy
    n_pad = _ceil_to(n_atoms, block_n)
    n_blocks = n_pad // block_n
    interpret = jax.default_backend() != "tpu"
    kconst = dict(kx=kx, ky=ky, kxy_pad=kxy_pad)

    bx = lambda: pl.BlockSpec((kx, block_n), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    by = lambda: pl.BlockSpec((ky, block_n), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    bz = lambda: pl.BlockSpec((block_n, kz2), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    bab = lambda: pl.BlockSpec((kxy_pad, kz2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)

    def _fwd_impl(cxT, sxT, cyT, syT, zq):
        return pl.pallas_call(
            partial(_fwd_kernel, **kconst),
            grid=(n_blocks,),
            in_specs=[bx(), bx(), by(), by(), bz()],
            out_specs=[bab(), bab()],
            out_shape=[jax.ShapeDtypeStruct((kxy_pad, kz2), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(cxT, sxT, cyT, syT, zq)

    def _bwd_impl(cxT, sxT, cyT, syT, zq, abar, bbar):
        dcx, dsx, dcy, dsy = pl.pallas_call(
            partial(_bwd_tables_kernel, **kconst),
            grid=(n_blocks,),
            in_specs=[bx(), bx(), by(), by(), bz(), bab(), bab()],
            out_specs=[bx(), bx(), by(), by()],
            out_shape=[
                jax.ShapeDtypeStruct((kx, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((kx, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((ky, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((ky, n_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(cxT, sxT, cyT, syT, zq, abar, bbar)
        dzq = pl.pallas_call(
            partial(_bwd_zq_kernel, **kconst),
            grid=(n_blocks,),
            in_specs=[bx(), bx(), by(), by(), bab(), bab()],
            out_specs=bz(),
            out_shape=jax.ShapeDtypeStruct((n_pad, kz2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(cxT, sxT, cyT, syT, abar, bbar)
        return dcx, dsx, dcy, dsy, dzq

    @jax.custom_vjp
    def sf(cxT, sxT, cyT, syT, zq):
        a, b = _fwd_impl(cxT, sxT, cyT, syT, zq)
        return a[:kxy], b[:kxy]

    def _fwd(cxT, sxT, cyT, syT, zq):
        return sf(cxT, sxT, cyT, syT, zq), (cxT, sxT, cyT, syT, zq)

    def _bwd(res, bars):
        cxT, sxT, cyT, syT, zq = res
        abar, bbar = bars
        pad = kxy_pad - kxy
        if pad:
            abar = jnp.pad(abar, ((0, pad), (0, 0)))
            bbar = jnp.pad(bbar, ((0, pad), (0, 0)))
        return _bwd_impl(cxT, sxT, cyT, syT, zq, abar, bbar)

    sf.defvjp(_fwd, _bwd)
    return sf, n_pad
