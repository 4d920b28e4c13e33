"""Velocity-Verlet NVE integration as a jit/scan loop.

The reference plugin delegates integration to OpenMM's Context/Integrator
machinery (SURVEY §1 L0).  Here an MD step is just a pure function over a
(positions, velocities, forces) state pytree; a trajectory is lax.scan over
it — the entire loop compiles to a single XLA program with no host
round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .energy import energy


class MDState(NamedTuple):
    positions: jax.Array   # [N, 3] nm
    velocities: jax.Array  # [N, 3] nm/ps
    forces: jax.Array      # [N, 3] kJ/mol/nm
    potential: jax.Array   # scalar kJ/mol


def init_state(positions, velocities, system) -> MDState:
    e, g = jax.value_and_grad(energy)(positions, system)
    return MDState(positions, velocities, -g, e)


def nve_step(state: MDState, system, masses: jax.Array, dt: float) -> MDState:
    """One velocity-Verlet step.  masses [N] in amu; dt in ps."""
    inv_m = (1.0 / masses)[:, None]
    v_half = state.velocities + 0.5 * dt * state.forces * inv_m
    x_new = state.positions + dt * v_half
    e, g = jax.value_and_grad(energy)(x_new, system)
    f_new = -g
    v_new = v_half + 0.5 * dt * f_new * inv_m
    return MDState(x_new, v_new, f_new, e)


def kinetic_energy(velocities, masses) -> jax.Array:
    return 0.5 * jnp.sum(masses[:, None] * velocities * velocities)


def nve_trajectory(state: MDState, system, masses, dt: float, n_steps: int):
    """Run n_steps of NVE; returns (final_state, per-step total energies)."""

    def body(s, _):
        s = nve_step(s, system, masses, dt)
        e_tot = s.potential + kinetic_energy(s.velocities, masses)
        return s, e_tot

    return jax.lax.scan(body, state, None, length=n_steps)
