"""Harmonic bonded potentials (bonds + angles).

The reference plugin computes *only* charge-flux electrostatics and relies on
OpenMM's host framework (SURVEY §1 L0) to supply bonded forces in a real
simulation.  A standalone engine must provide them, so flexible molecules
hold together in the NVE loop: E = 0.5 k (r - r0)^2 and 0.5 k (theta -
theta0)^2, with forces from jax.grad like everything else.

Like the flux terms (charges.py), bonded indices almost always repeat
per-molecule; ``BondedParams.create`` detects the template (topology.py) and
``bonded_energy`` then evaluates on [n_mol, atoms_per_mol, 3] reshapes with
static slices — no gathers/scatters (which cost ~7-15 ns/element on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .pairs import displacement
from .topology import MoleculeTemplate, detect_template


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


def _template_bonded_energy(positions, bonded) -> jax.Array:
    """Gather-free bonded energy via the molecule template (static slices;
    same formulas as the general path above)."""
    tpl = bonded.template
    box, pbc = bonded.box, bonded.pbc
    off, s, c = tpl.offset, tpl.stride, tpl.count
    pos_m = positions[off:off + c * s].reshape(c, s, 3)
    p = [pos_m[:, l] for l in range(s)]
    e = jnp.zeros((), positions.dtype)

    rows = tpl.local_rows("bonds")
    if rows:
        m = len(rows)
        k = bonded.bond_k.reshape(c, m)
        r0 = bonded.bond_r0.reshape(c, m)
        for t, (l1, l2) in enumerate(rows):
            d = displacement(p[l1], p[l2], box, pbc)
            r = jnp.sqrt(jnp.sum(d * d, axis=-1))
            e = e + 0.5 * jnp.sum(k[:, t] * (r - r0[:, t]) ** 2)

    rows = tpl.local_rows("angles")
    if rows:
        m = len(rows)
        k = bonded.angle_k.reshape(c, m)
        t0 = bonded.angle_theta0.reshape(c, m)
        for t, (l1, l2, l3) in enumerate(rows):
            d21 = displacement(p[l2], p[l1], box, pbc)
            d23 = displacement(p[l2], p[l3], box, pbc)
            r21 = jnp.sqrt(jnp.sum(d21 * d21, axis=-1))
            r23 = jnp.sqrt(jnp.sum(d23 * d23, axis=-1))
            cost = jnp.sum(d21 * d23, axis=-1) / (r21 * r23)
            theta = jnp.arccos(jnp.clip(cost, -1.0, 1.0))
            e = e + 0.5 * jnp.sum(k[:, t] * (theta - t0[:, t]) ** 2)
    return e


def bonded_energy(positions: jax.Array, bonded: "BondedParams") -> jax.Array:
    if bonded.template is not None:
        return _template_bonded_energy(positions, bonded)
    e = harmonic_bond_energy(positions, bonded.bond_idx, bonded.bond_k,
                             bonded.bond_r0, bonded.box, bonded.pbc)
    e = e + harmonic_angle_energy(positions, bonded.angle_idx, bonded.angle_k,
                                  bonded.angle_theta0, bonded.box, bonded.pbc)
    return e


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
    template: Optional[MoleculeTemplate] = dataclasses.field(
        default=None, metadata=dict(static=True))

    @classmethod
    def create(cls, bond_idx, bond_k, bond_r0, angle_idx, angle_k,
               angle_theta0, box, pbc, n_atoms=None,
               dtype=None) -> "BondedParams":
        """Build with molecule-template detection: when the index structure
        repeats per molecule, term arrays are reordered molecule-major and
        the fast static-slice path is used."""
        bond_idx = np.asarray(bond_idx, np.int64).reshape(-1, 2)
        angle_idx = np.asarray(angle_idx, np.int64).reshape(-1, 3)
        template = None
        det = detect_template({"bonds": bond_idx, "angles": angle_idx},
                              n_atoms=n_atoms)
        bond_k = np.asarray(bond_k)
        bond_r0 = np.asarray(bond_r0)
        angle_k = np.asarray(angle_k)
        angle_theta0 = np.asarray(angle_theta0)
        if det is not None:
            template, perms = det
            bp, ap = perms["bonds"], perms["angles"]
            bond_idx, bond_k, bond_r0 = bond_idx[bp], bond_k[bp], bond_r0[bp]
            angle_idx, angle_k, angle_theta0 = (angle_idx[ap], angle_k[ap],
                                                angle_theta0[ap])
        if dtype is None:
            dtype = jnp.float32
        return cls(
            bond_idx=jnp.asarray(bond_idx, jnp.int32),
            bond_k=jnp.asarray(bond_k, dtype),
            bond_r0=jnp.asarray(bond_r0, dtype),
            angle_idx=jnp.asarray(angle_idx, jnp.int32),
            angle_k=jnp.asarray(angle_k, dtype),
            angle_theta0=jnp.asarray(angle_theta0, dtype),
            box=jnp.asarray(box, dtype),
            pbc=pbc,
            template=template,
        )
