"""Mosaic fused direct-space walk (ops/pallas_walk.py) vs the XLA roll walk.

Runs the kernel in Pallas interpret mode on CPU (f32): energy, dE/dx and
dE/dq must agree with cells._roll_fused_walk to f32 accumulation roundoff.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chargeflux_tpu import cells
from chargeflux_tpu.charges import effective_charges
from chargeflux_tpu.models import water_box
from chargeflux_tpu.ops.pallas_walk import mosaic_fused_walk


@pytest.fixture(scope="module", params=[(7, 0.65), (9, 0.6)])
def walk_case(request):
    n_side, cutoff = request.param
    force, pos, _, box = water_box(n_side=n_side, flux="bond_angle",
                                   cutoff=cutoff, seed=3)
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell")
    x = jnp.asarray(pos, jnp.float32)
    q = effective_charges(x, system)
    spec = system.spec
    slots, inv, _ = cells.build_cell_list_full(x, system.box, spec.cell_grid,
                                               spec.cell_capacity)
    blocks = cells.blockify(x, q, system, slots, inv)
    return system, blocks, slots.reshape(blocks.x.shape)


def test_mosaic_walk_matches_roll_walk(walk_case):
    system, blocks, ids = walk_case
    e_ref, g_ref, dq_ref = cells._roll_fused_walk(blocks, ids, system)
    e_pal, g_pal, dq_pal = mosaic_fused_walk(blocks, ids, system)

    assert abs(float(e_ref - e_pal)) / abs(float(e_ref)) < 1e-5
    for c in range(3):
        a, b = np.asarray(g_ref[c]), np.asarray(g_pal[c])
        assert np.abs(a - b).max() <= 1e-4 * (np.abs(a).max() + 1e-30), c
    a, b = np.asarray(dq_ref), np.asarray(dq_pal)
    assert np.abs(a - b).max() <= 1e-4 * (np.abs(a).max() + 1e-30)


def test_mosaic_walk_pad_subtile_safety(walk_case):
    """Atoms dropped into pad slots (sentinel id) must contribute nothing:
    perturb pad-slot coordinates and check outputs are unchanged."""
    system, blocks, ids = walk_case
    n = system.n_atoms
    pad = (ids >= n).astype(jnp.float32)
    blocks2 = blocks._replace(x=blocks.x + 17.3 * pad,
                              y=blocks.y - 5.1 * pad)
    e1, g1, dq1 = mosaic_fused_walk(blocks, ids, system)
    e2, g2, dq2 = mosaic_fused_walk(blocks2, ids, system)
    assert float(e1) == float(e2)
    for c in range(3):
        valid = np.asarray(1.0 - pad)
        a = np.asarray(g1[c]) * valid
        b = np.asarray(g2[c]) * valid
        np.testing.assert_array_equal(a, b)
