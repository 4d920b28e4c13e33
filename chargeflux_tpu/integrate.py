"""Velocity-Verlet NVE integration as a jit/scan loop.

The reference plugin delegates integration to OpenMM's Context/Integrator
machinery (SURVEY §1 L0).  Here an MD step is a pure function over a
(positions, velocities, forces) state pytree driven by an arbitrary
``energy_fn(positions) -> scalar`` (e.g. charge-flux electrostatics + bonded
terms); a trajectory is lax.scan over it — the entire loop compiles to a
single XLA program with no host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .bonded import bonded_energy
from .energy import _energy


class MDState(NamedTuple):
    positions: jax.Array   # [N, 3] nm
    velocities: jax.Array  # [N, 3] nm/ps
    forces: jax.Array      # [N, 3] kJ/mol/nm
    potential: jax.Array   # scalar kJ/mol


def make_energy_fn(system, bonded=None) -> Callable:
    """Charge-flux electrostatics (+ optional bonded terms) as a closure
    suitable for the integrator."""

    def e_fn(x):
        e = _energy(x, system)
        if bonded is not None:
            e = e + bonded_energy(x, bonded)
        return e

    return e_fn


def init_state(positions, velocities, energy_fn) -> MDState:
    e, g = jax.value_and_grad(energy_fn)(positions)
    return MDState(positions, velocities, -g, e)


def nve_step(state: MDState, energy_fn, masses: jax.Array, dt: float) -> MDState:
    """One velocity-Verlet step.  masses [N] in amu; dt in ps."""
    inv_m = (1.0 / masses)[:, None]
    v_half = state.velocities + 0.5 * dt * state.forces * inv_m
    x_new = state.positions + dt * v_half
    e, g = jax.value_and_grad(energy_fn)(x_new)
    f_new = -g
    v_new = v_half + 0.5 * dt * f_new * inv_m
    return MDState(x_new, v_new, f_new, e)


def kinetic_energy(velocities, masses) -> jax.Array:
    return 0.5 * jnp.sum(masses[:, None] * velocities * velocities)


def nve_trajectory(state: MDState, energy_fn, masses, dt: float, n_steps: int):
    """Run n_steps of NVE; returns (final_state, per-step total energies)."""

    def body(s, _):
        s = nve_step(s, energy_fn, masses, dt)
        e_tot = s.potential + kinetic_energy(s.velocities, masses)
        return s, e_tot

    return jax.lax.scan(body, state, None, length=n_steps)
