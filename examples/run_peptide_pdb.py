"""Worked example: a real mixed-topology PDB through the general
heterogeneous on-ramp (models.system_from_pdb).

A reference user's workflow is "PDB + parameter table -> Context"; the
plugin itself only sees flat addParticle/addException/addFlux* vectors
(CoulForce.h:137-149).  This example is that workflow end-to-end here: a
small peptide-like chain solvated in water, one ResidueParams entry per
residue type, Langevin MD on the assembled heterogeneous system (waters
on the molecule-template fast path, the linked chain on the scatter
remainder).

    python examples/run_peptide_pdb.py [n_steps] [--cpu] [--pdb file.pdb]

Without ``--pdb`` a peptide+water box PDB is generated on the fly (and
left in /tmp for inspection), so the example is self-contained.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

PDB_PATH = None
if "--pdb" in sys.argv:
    i = sys.argv.index("--pdb")
    if i + 1 >= len(sys.argv):
        raise SystemExit("--pdb needs a file path operand")
    PDB_PATH = sys.argv[i + 1]
    del sys.argv[i:i + 2]

import jax.numpy as jnp

import chargeflux_tpu as cf
from chargeflux_tpu.bonded import BondedParams
from chargeflux_tpu.integrate import (init_state_nb, langevin_trajectory_nb,
                                      make_nb_energy_fn)
from chargeflux_tpu.models import ResidueParams, system_from_pdb
from chargeflux_tpu.models.water import (ANGLE_HOH, EPS_H, EPS_O, KA_HOH,
                                         KB_OH, K_ANGLE, K_BOND, Q_H, Q_O,
                                         R_OH, SIG_H, SIG_O)

# --- the parameter table: one entry per residue type ----------------------
# A peptide-like 3-atom backbone (N, CA, C): intra flux bonds/exclusions,
# harmonic geometry, and "-"-prefixed backbone links to the previous
# residue (applied between consecutive-resseq runs only).
GLY = ResidueParams(
    atoms={"N": (0.25, 0.21, 0.2, 14.007),
           "CA": (-0.1, 0.23, 0.15, 12.011),
           "C": (-0.15, 0.22, 0.12, 12.011)},
    flux_bonds=[("N", "CA", 0.35, 0.146), ("CA", "C", 0.3, 0.152)],
    exclusions=[("N", "CA"), ("CA", "C"), ("N", "C")],
    bonds=[("N", "CA", 60000.0, 0.14), ("CA", "C", 60000.0, 0.14)],
    angles=[("N", "CA", "C", 300.0, 3.0)],
    link_exclusions=[("-C", "N"), ("-CA", "N")],
    link_flux_bonds=[("-C", "N", 0.4, 0.133)],
    link_bonds=[("-C", "N", 70000.0, 0.135)],
    link_angles=[("-CA", "-C", "N", 280.0, 3.0)],
)
HOH = ResidueParams(
    atoms={"O": (Q_O, SIG_O, EPS_O, 15.999),
           "H1": (Q_H, SIG_H, EPS_H, 1.008),
           "H2": (Q_H, SIG_H, EPS_H, 1.008)},
    flux_bonds=[("O", "H1", K_BOND, R_OH), ("O", "H2", K_BOND, R_OH)],
    flux_angles=[("H1", "O", "H2", K_ANGLE, ANGLE_HOH)],
    exclusions=[("O", "H1"), ("O", "H2"), ("H1", "H2")],
    bonds=[("O", "H1", KB_OH, R_OH), ("O", "H2", KB_OH, R_OH)],
    angles=[("H1", "O", "H2", KA_HOH, ANGLE_HOH)],
)
PARAMS = {"GLY": GLY, "HOH": HOH}


def _generate_pdb(path, n_res=4, n_side=6, seed=11):
    """Self-contained input: a serpentine backbone row + waters."""
    from chargeflux_tpu.models.water import _one_water
    from chargeflux_tpu.utils.trajectory import write_pdb

    rng = np.random.default_rng(seed)
    spacing = 0.31
    box = np.full(3, n_side * spacing)
    pos, names, resnames, resseq = [], [], [], []
    for r in range(n_res):
        for j, nm in enumerate(("N", "CA", "C")):
            pos.append([0.12 + 0.135 * (3 * r + j), box[1] / 2, box[2] / 2]
                       + 0.01 * rng.standard_normal(3))
            names.append(nm)
            resnames.append("GLY")
            resseq.append(r + 1)
    k = 0
    mid = n_side // 2
    for ix in range(n_side):
        for iy in range(n_side):
            for iz in range(n_side):
                if iy == mid and iz == mid:
                    continue  # the chain's row
                c = spacing * (np.array([ix, iy, iz]) + 0.5)
                pos.extend(_one_water(c + 0.01 * rng.standard_normal(3),
                                      rng))
                names.extend(["O", "H1", "H2"])
                resnames.extend(["HOH"] * 3)
                resseq.extend([n_res + 1 + k] * 3)
                k += 1
    write_pdb(path, np.asarray(pos), box=box, names=names,
              resnames=resnames, resseq=resseq,
              symbols=[nm[0] for nm in names])
    return path


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    path = PDB_PATH or _generate_pdb("/tmp/peptide_water_example.pdb")
    force, pos, masses, box, bonded_kw = system_from_pdb(
        path, PARAMS, cutoff=0.6)
    system = force.create_system(box=box, dtype=jnp.float32)
    ts = system.spec.flux_template
    print(f"{path}: {force.getNumParticles()} atoms, "
          f"{force.getNumFluxBonds()} flux bonds; templates="
          f"{[(t.stride, t.count) for t in ts.templates] if ts else None}")

    bonded = BondedParams.create(box=np.asarray(box), pbc=True,
                                 dtype=jnp.float32, **bonded_kw)
    e_fn, init_nb = make_nb_energy_fn(system, bonded=bonded)
    x0 = jnp.asarray(pos, jnp.float32)
    state = init_state_nb(x0, jnp.zeros_like(x0), e_fn, init_nb)
    m = jnp.asarray(masses, jnp.float32)
    final, kes = langevin_trajectory_nb(
        state, e_fn, init_nb, m, dt=5e-4, temperature=300.0, friction=5.0,
        key=jax.random.PRNGKey(0), n_steps=n_steps, rebuild_every=10)
    kes = np.asarray(kes)
    assert np.all(np.isfinite(kes)), "trajectory NaN'd"
    kB = 0.00831446261815324
    t_final = 2.0 * kes[-1] / (3.0 * len(pos) * kB)
    print(f"{n_steps} Langevin steps OK; final instantaneous T = "
          f"{t_final:.1f} K, potential = {float(final.potential):.3f} "
          f"kJ/mol")


if __name__ == "__main__":
    main()
