"""Pallas TPU kernel for the cell-blocked SPME spread — VMEM-resident grid.

The XLA cell-blocked spread (pme.pme_cell_reciprocal_energy) is correct and
scatter-free, but it materializes the [n_cells, cap, Wx*Wy] patch tensor in
HBM (57 MB at the 30k shape) on both the forward and backward passes, and
folds patches onto the mesh with three placement matmuls (another ~60 MB of
HBM round trips).  Replaces the reference's per-k-vector reciprocal kernels
(PBCForce.cu:841-950) at the same contract.

This kernel keeps everything on-chip:

* one program per **cell column** (cx, cy): its z-cells' atoms form a
  [rows = n_cz * cap] axis kept LAST so it is the (128-aligned) lane
  dimension of every operand — Mosaic reshapes then only merge/split
  leading/sublane dims, which is layout-preserving;
* z-spline weights arrive as **compact per-row taps** [order, rows] plus an
  int32 tap origin, and are expanded to the dense-over-Gz form **inside the
  kernel** (order static selects against a lane iota — VPU-cheap).  The
  dense [cols, rows, Gz] tensor never exists in HBM (it was 8.9 MB x 4
  passes at the 30k shape, plus a Gz-dense B-spline evaluation in XLA —
  measured ~0.2 ms of the reciprocal's 1.05, tools/pme_pieces.py), and the
  periodic wrap folded into the tap origin means the patch->grid placement
  along z is still performed *by the MXU contraction itself*;
* the patch P[(x,y), gz] = A[(x,y), row] @ Wz[row, gz] is one MXU matmul
  per column (A = qwlx (x) wly built in VMEM, never touching HBM); the Wy
  axis is padded to a sublane multiple (8) with zero weight rows so the
  (Wx, Wyp) -> Wx*Wyp flatten is tile-aligned;
* P accumulates into an x/y-padded mesh held in VMEM across the whole
  sequential program grid (output block revisiting); the two remaining
  ghost-edge folds are static slice-adds in XLA (fold_padded_axis).

The backward pass is a second kernel with the transposed matmuls (d_Wz =
A^T dP contracted back to the taps, d_A = dP Wz^T) and VPU reductions for
the x/y weight cotangents.  Forces stay the exact gradient of the computed
energy: both kernels contract the same weight tensors the XLA path uses.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST


def _expand_z(wzt, zorg, gz):
    """Dense z weights [rows, Gz] from compact taps.

    wzt: [order, rows] tap values; zorg: [1, rows] int32 tap-0 mesh index,
    already reduced mod Gz.  Static unroll over the order; each tap lands
    at (zorg + k) mod Gz via one compare+select against a lane iota.
    """
    order, rows = wzt.shape
    giota = jax.lax.broadcasted_iota(jnp.int32, (rows, gz), 1)
    org = zorg[0][:, None]                               # [rows, 1]
    acc = jnp.zeros((rows, gz), wzt.dtype)
    for k in range(order):
        idx = org + k
        idx = jnp.where(idx >= gz, idx - gz, idx)        # single wrap
        acc = acc + jnp.where(giota == idx, wzt[k][:, None], 0.0)
    return acc


def _fwd_kernel(off_ref, qwlxt_ref, wlyt_ref, wzt_ref, zorg_ref, out_ref,
                *, gz, cb):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for k in range(cb):
        qwlxt = qwlxt_ref[k]                      # [Wx, rows]
        wlyt = wlyt_ref[k]                        # [Wyp, rows] (zero-padded)
        wzd = _expand_z(wzt_ref[k], zorg_ref[k], gz)   # [rows, Gz]
        wx, rows = qwlxt.shape
        wyp = wlyt.shape[0]
        a2 = (qwlxt[:, None, :] * wlyt[None, :, :]).reshape(wx * wyp, rows)
        # P[(x,y), gz] — contraction over the row axis rides the MXU.
        p = jax.lax.dot_general(a2, wzd, (((1,), (0,)), ((), ())),
                                precision=_HIGHEST,
                                preferred_element_type=jnp.float32)
        ox = off_ref[0, pid * cb + k]
        oy = off_ref[1, pid * cb + k]
        cur = out_ref[pl.ds(ox, wx), pl.ds(oy, wyp), :]
        out_ref[pl.ds(ox, wx), pl.ds(oy, wyp), :] = \
            cur + p.reshape(wx, wyp, gz)


def _bwd_kernel(off_ref, qwlxt_ref, wlyt_ref, wzt_ref, zorg_ref, ct_ref,
                d_qwlxt_ref, d_wlyt_ref, d_wzt_ref, *, gz, cb):
    pid = pl.program_id(0)
    for k in range(cb):
        qwlxt = qwlxt_ref[k]                      # [Wx, rows]
        wlyt = wlyt_ref[k]                        # [Wyp, rows]
        wzt = wzt_ref[k]                          # [order, rows]
        zorg = zorg_ref[k]                        # [1, rows]
        wzd = _expand_z(wzt, zorg, gz)            # [rows, Gz]
        wx, rows = qwlxt.shape
        wyp = wlyt.shape[0]
        order = wzt.shape[0]
        ox = off_ref[0, pid * cb + k]
        oy = off_ref[1, pid * cb + k]
        dp = ct_ref[pl.ds(ox, wx), pl.ds(oy, wyp), :].reshape(wx * wyp, gz)
        # d_Wz[row, gz] = sum_xy A[(x,y), row] dP[(x,y), gz], contracted back
        # to the compact taps: d_taps[j, row] = d_Wz[row, (zorg + j) mod Gz]
        a2 = (qwlxt[:, None, :] * wlyt[None, :, :]).reshape(wx * wyp, rows)
        d_dense = jax.lax.dot_general(
            a2, dp, (((0,), (0,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=jnp.float32)          # [rows, Gz]
        giota = jax.lax.broadcasted_iota(jnp.int32, (rows, gz), 1)
        org = zorg[0][:, None]
        taps = []
        for j in range(order):
            idx = org + j
            idx = jnp.where(idx >= gz, idx - gz, idx)
            taps.append(jnp.sum(jnp.where(giota == idx, d_dense, 0.0),
                                axis=1))
        d_wzt_ref[k] = jnp.stack(taps, axis=0)
        # d_A[(x,y), row] = sum_gz dP[(x,y), gz] Wz[row, gz]
        d_a2 = jax.lax.dot_general(
            dp, wzd, (((1,), (1,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=jnp.float32).reshape(wx, wyp, rows)
        d_qwlxt_ref[k] = jnp.sum(d_a2 * wlyt[None, :, :], axis=1)
        d_wlyt_ref[k] = jnp.sum(d_a2 * qwlxt[:, None, :], axis=0)


def _col_block(a, cb=1):
    """Per-program [cb, *rest] block of a per-column input.  Index maps
    receive the scalar-prefetch ref as a trailing argument."""
    return pl.BlockSpec((cb,) + a.shape[1:], lambda i, off: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _grid_block(shape):
    return pl.BlockSpec(shape, lambda i, off: (0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def spread_columns(qwlxt, wlyt, wzt, zorg, offsets, pad_xy, col_batch=1):
    """Spread per-column patches onto an x/y-padded mesh.

    qwlxt/wlyt: [n_col, Wx|Wyp, rows] transposed compact x/y spline weights
    (qwlxt carries the charges; wlyt zero-padded to a sublane multiple);
    wzt: [n_col, order, rows] compact z taps with zorg [n_col, 1, rows]
    int32 tap origins (mod Gz; the kernel expands them to dense-over-Gz in
    VMEM); offsets: static ((ox...), (oy...)) per column into the padded
    mesh; pad_xy: (Px, Py, Gz).  ``col_batch`` columns are processed per
    program (must divide n_col) to amortize per-program pipeline costs.
    Returns Qpad [Px, Py, Gz].
    """
    return _spread_fwd(qwlxt, wlyt, wzt, zorg, offsets, pad_xy, col_batch)[0]


def _spread_fwd(qwlxt, wlyt, wzt, zorg, offsets, pad_xy, cb):
    n_col = qwlxt.shape[0]
    assert n_col % cb == 0, (n_col, cb)
    px, py, gz = pad_xy
    off = jnp.asarray(np.asarray(offsets), jnp.int32)      # [2, n_col]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_col // cb,),
        in_specs=[_col_block(qwlxt, cb), _col_block(wlyt, cb),
                  _col_block(wzt, cb), _col_block(zorg, cb)],
        out_specs=_grid_block((px, py, gz)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, gz=gz, cb=cb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((px, py, gz), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(off, qwlxt, wlyt, wzt, zorg)
    return out, (qwlxt, wlyt, wzt, zorg)


def _spread_bwd(offsets, pad_xy, cb, res, ct):
    qwlxt, wlyt, wzt, zorg = res
    n_col = qwlxt.shape[0]
    gz = pad_xy[2]
    off = jnp.asarray(np.asarray(offsets), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_col // cb,),
        in_specs=[_col_block(qwlxt, cb), _col_block(wlyt, cb),
                  _col_block(wzt, cb), _col_block(zorg, cb),
                  _grid_block(pad_xy)],
        out_specs=[_col_block(qwlxt, cb), _col_block(wlyt, cb),
                   _col_block(wzt, cb)],
    )
    d_qwlxt, d_wlyt, d_wzt = pl.pallas_call(
        functools.partial(_bwd_kernel, gz=gz, cb=cb),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(qwlxt.shape, jnp.float32),
                   jax.ShapeDtypeStruct(wlyt.shape, jnp.float32),
                   jax.ShapeDtypeStruct(wzt.shape, jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(off, qwlxt, wlyt, wzt, zorg, ct)
    return (d_qwlxt, d_wlyt, d_wzt,
            np.zeros(zorg.shape, dtype=jax.dtypes.float0))


spread_columns.defvjp(_spread_fwd, _spread_bwd)


def fold_padded_axis(qpad, grid_n: int, order: int, axis: int):
    """Wrap-fold one padded axis back onto the mesh: padded index p maps to
    mesh index (p - order) mod grid_n.  Static slice-adds (the pad extents
    are < grid_n by construction)."""
    pn = qpad.shape[axis]
    sl = lambda a, b: jax.lax.slice_in_dim(qpad, a, b, axis=axis)
    core = sl(order, order + grid_n)
    lo = sl(0, order)                                    # p < order -> tail
    pre = [0] * core.ndim
    pre[axis] = grid_n - order
    core = core + jnp.pad(lo, [(pre[d], core.shape[d] - pre[d]
                                - lo.shape[d]) for d in range(core.ndim)])
    if pn > order + grid_n:                              # head wrap
        hi = sl(order + grid_n, pn)
        core = core + jnp.pad(hi, [
            (0, core.shape[d] - hi.shape[d]) for d in range(core.ndim)])
    return core
