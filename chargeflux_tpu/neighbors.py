"""Neighbor-state reuse with a skin radius — amortized cell-list rebuilds.

The reference rebuilds its neighbor list on every evaluation
(ReferenceCoulKernels.cpp:559, SURVEY §5 quirk 7).  Here the binning
(cells.build_cell_list_full, ~0.9 ms at 30k) is reused across steps: the
cell edge already exceeds the cutoff (edge = box/floor(box/cutoff)), so the
surplus is a free *skin* — the traversal's r < cutoff mask keeps results
exact while every atom has moved less than skin/2 since the last rebuild
(the standard Verlet-list argument).  Trajectory drivers amortize by
rebuilding *unconditionally* every ``suggest_rebuild_interval`` steps in a
nested scan, with ``neighbor_state_fresh`` as a NaN-poison backstop — a
data-dependent ``lax.cond`` rebuild costs ~0.8 ms/step on TPU even on the
cheap branch (CLAUDE.md, measured), more than the binning it skips; the
``refresh_neighbor_state`` cond variant is for host-driven stepping only.

Wrap offsets are frozen at rebuild time (``wrap = box*floor(x_ref/box)``):
during reuse, block coordinates are ``x - wrap`` — continuous across the
periodic boundary, so an atom drifting over the box edge stays numerically
next to its binned cell and the static per-cell image offsets remain valid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cells import build_cell_list_full, wrap_offsets
from .pairs import plane_widths


class NeighborState(NamedTuple):
    """Reusable binning state (see module docstring)."""

    slots: jax.Array      # [n_cells, cap] int32, slot -> atom id
    inv_slot: jax.Array   # [N] int32, atom -> flat slot
    wrap: jax.Array       # [N, 3] lattice wrap offset at rebuild
    x_ref: jax.Array      # [N, 3] positions at rebuild
    overflow: jax.Array   # int32 dropped-atom count at rebuild


def skin_radius(system) -> jax.Array:
    """Free skin: smallest cell plane spacing minus the cutoff (>= 0).
    Plane spacings equal the cell edges for an orthorhombic box."""
    spec = system.spec
    grid = jnp.asarray(np.asarray(spec.cell_grid), system.box.dtype)
    return jnp.maximum(
        jnp.min(plane_widths(system.box) / grid) - spec.cutoff, 0.0)


def build_neighbor_state(positions: jax.Array, system) -> NeighborState:
    spec = system.spec
    slots, inv_slot, overflow = build_cell_list_full(
        positions, system.box, spec.cell_grid, spec.cell_capacity)
    wrap = wrap_offsets(positions, system.box)
    return NeighborState(slots=slots, inv_slot=inv_slot, wrap=wrap,
                         x_ref=positions, overflow=overflow)


def neighbor_state_fresh(state: NeighborState, positions: jax.Array,
                         system) -> jax.Array:
    """True while every atom has moved <= skin/2 since the last rebuild
    (so the reused binning still yields every pair within the cutoff).

    ``<=`` not ``<``: a zero-skin grid (commensurate box, skin_frac=0)
    must read fresh at the exact rebuild positions — a strict compare
    made 0 < 0 False, NaN-poisoning every step of a rebuild_every=1
    trajectory that is in fact exact."""
    half_skin = 0.5 * skin_radius(system)
    d = positions - state.x_ref
    max_d2 = jnp.max(jnp.sum(d * d, axis=-1))
    return max_d2 <= half_skin * half_skin


def refresh_neighbor_state(state: NeighborState, positions: jax.Array,
                           system) -> NeighborState:
    """Rebuild the binning iff an atom moved past skin/2 (lax.cond: the
    rebuild cost is paid only on rebuild steps).  Non-differentiable by
    construction; callers should treat the result as constant data.

    NOT the production pattern: a data-dependent lax.cond costs ~0.8
    ms/step on TPU even when the cheap branch is taken (CLAUDE.md,
    measured), more than the binning it skips — trajectory drivers
    (integrate.nve_trajectory_nb etc.) instead rebuild unconditionally
    every K steps in a nested scan with the freshness guard as a NaN
    backstop.  Kept for interactive/host-driven stepping and tests."""
    return jax.lax.cond(
        neighbor_state_fresh(state, positions, system),
        lambda: state,
        lambda: build_neighbor_state(positions, system),
    )


def suggest_rebuild_interval(system, dt: float, max_speed: float = 8.0,
                             cap: int = 50) -> int:
    """Steps between unconditional rebuilds such that atoms moving at
    ``max_speed`` (nm/ps) stay within skin/2.  At least 1 (rebuild every
    step when the grid leaves no skin); the e_fn guard still NaN-poisons
    if the bound is ever beaten.

    The default bound is 8, NOT the thermal mean: what matters is the
    *fastest* atom in the box over the whole interval.  A 300 K hydrogen
    has per-component sigma = sqrt(kB T / m) ~ 1.6 nm/ps, so ~0.2 % of
    hydrogens exceed 6 nm/ps at any instant and the max over 1e4-1e5
    atoms sits near 7 (measured 8.3 nm/ps in the 30k bench box during its
    lattice-relaxation transient — the historical default of 4 "generous
    for 300 K" tripped the NaN guard there).  Pass a larger bound for hot
    or non-equilibrated systems, or measure max |v| and add margin."""
    from .system import box_widths

    spec = system.spec
    box = np.asarray(jax.device_get(system.box), dtype=np.float64)
    grid = np.asarray(spec.cell_grid)
    widths = np.asarray(box_widths(box))
    skin = max(float(np.min(widths / grid)) - spec.cutoff, 0.0)
    return int(max(1, min(cap, np.floor(0.5 * skin / (max_speed * dt)))))
