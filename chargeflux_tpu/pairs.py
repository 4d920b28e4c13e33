"""Displacement geometry and dense pair masking.

Replaces the reference's use of OpenMM ``ReferenceForce::getDeltaR`` /
``getDeltaRPeriodic`` (ReferenceCoulKernels.cpp:52-56, 93-101, 172-181) and
the per-atom exclusion sets (ReferenceCoulKernels.cpp:385-391).

Minimum-image convention: orthorhombic boxes only (the reference bakes in the
same assumption, ReferenceCoulKernels.cpp:513-517).  We use
``delta - box * floor(delta / box + 0.5)``, matching OpenMM's reference
implementation exactly (round-half-up at the box boundary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def delta_direct(pa: jax.Array, pb: jax.Array) -> jax.Array:
    """Displacement a -> b without PBC: pb - pa."""
    return pb - pa


def delta_periodic(pa: jax.Array, pb: jax.Array, box: jax.Array) -> jax.Array:
    """Minimum-image displacement a -> b in an orthorhombic box.

    ``box`` is a length-3 vector of edge lengths, broadcast against the last
    axis of the positions.
    """
    d = pb - pa
    return d - box * jnp.floor(d / box + 0.5)


def displacement(pa, pb, box, pbc: bool):
    """Dispatch on the static pbc flag (trace-time branch)."""
    if pbc:
        return delta_periodic(pa, pb, box)
    return delta_direct(pa, pb)


def safe_norm(d: jax.Array, axis: int = -1):
    """(r, r^2) with a grad-safe sqrt: where r^2 == 0 the norm is 0 with zero
    gradient instead of NaN (the double-where trick)."""
    r2 = jnp.sum(d * d, axis=axis)
    nonzero = r2 > 0
    r2_safe = jnp.where(nonzero, r2, 1.0)
    r = jnp.where(nonzero, jnp.sqrt(r2_safe), 0.0)
    return r, r2


def pair_matrix_mask(n: int, exclusions: jax.Array, dtype=jnp.bool_) -> jax.Array:
    """[N, N] mask of interacting ordered pairs i < j, with excluded pairs
    removed.

    Encodes the net exclusion *contract* (SURVEY §5): an excluded pair
    contributes neither short-range Coulomb nor LJ.  This replaces both the
    reference CPU's add-then-subtract loops (ReferenceCoulKernels.cpp:464-491)
    and the CUDA compute-all-then-subtract route (PBCForce.cu:753-815) with a
    single static mask — algebraically identical, branch-free under XLA.
    """
    i = jnp.arange(n)
    upper = i[:, None] < i[None, :]
    mask = upper
    if exclusions.shape[0] > 0:
        p1 = exclusions[:, 0]
        p2 = exclusions[:, 1]
        excl = jnp.zeros((n, n), dtype=jnp.bool_)
        excl = excl.at[p1, p2].set(True)
        excl = excl.at[p2, p1].set(True)
        mask = mask & ~excl
    return mask.astype(dtype)
