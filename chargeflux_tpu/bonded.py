"""Harmonic bonded potentials (bonds + angles).

The reference plugin computes *only* charge-flux electrostatics and relies on
OpenMM's host framework (SURVEY §1 L0) to supply bonded forces in a real
simulation.  A standalone engine must provide them, so flexible molecules
hold together in the NVE loop: E = 0.5 k (r - r0)^2 and 0.5 k (theta -
theta0)^2, with forces from jax.grad like everything else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pairs import displacement
from .system import ChargeFluxSystem


def harmonic_bond_energy(positions, idx, k, r0, box, pbc):
    """0.5 * k * (|r12| - r0)^2 summed over bonds.  idx [B,2]."""
    if idx.shape[0] == 0:
        return jnp.zeros((), positions.dtype)
    d = displacement(positions[idx[:, 0]], positions[idx[:, 1]], box, pbc)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    return 0.5 * jnp.sum(k * (r - r0) ** 2)


def harmonic_angle_energy(positions, idx, k, theta0, box, pbc):
    """0.5 * k * (theta - theta0)^2 over angles 1-2-3 (2 is the vertex)."""
    if idx.shape[0] == 0:
        return jnp.zeros((), positions.dtype)
    d21 = displacement(positions[idx[:, 1]], positions[idx[:, 0]], box, pbc)
    d23 = displacement(positions[idx[:, 1]], positions[idx[:, 2]], box, pbc)
    r21 = jnp.sqrt(jnp.sum(d21 * d21, axis=-1))
    r23 = jnp.sqrt(jnp.sum(d23 * d23, axis=-1))
    cost = jnp.sum(d21 * d23, axis=-1) / (r21 * r23)
    theta = jnp.arccos(jnp.clip(cost, -1.0, 1.0))
    return 0.5 * jnp.sum(k * (theta - theta0) ** 2)


def bonded_energy(positions: jax.Array, bonded: "BondedParams") -> jax.Array:
    e = harmonic_bond_energy(positions, bonded.bond_idx, bonded.bond_k,
                             bonded.bond_r0, bonded.box, bonded.pbc)
    e = e + harmonic_angle_energy(positions, bonded.angle_idx, bonded.angle_k,
                                  bonded.angle_theta0, bonded.box, bonded.pbc)
    return e


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BondedParams:
    """Bonded-term parameter pytree (companion to ChargeFluxSystem)."""

    bond_idx: jax.Array      # [B, 2] int32
    bond_k: jax.Array        # [B] kJ/mol/nm^2
    bond_r0: jax.Array       # [B] nm
    angle_idx: jax.Array     # [A, 3] int32 (vertex = column 1)
    angle_k: jax.Array       # [A] kJ/mol/rad^2
    angle_theta0: jax.Array  # [A] rad
    box: jax.Array           # [3]
    pbc: bool = dataclasses.field(metadata=dict(static=True))
