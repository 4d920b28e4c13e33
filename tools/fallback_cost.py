"""Measure the non-halo work-sharding fallback's cost vs the halo path
(VERDICT r3 item 6): shard.py documents the cell-row fallback as
"correctness/coverage, not fast" — this records the number so odd meshes
(prime grids, space=3) have a known price.

Real multi-chip hardware is unavailable here (one v5e behind the axon
tunnel), so this measures on the virtual CPU mesh: wall time of
jit(value_and_grad(energy)) per call for

  halo@D       ppermute slab decomposition on D devices
  fallback@D   gather-based cell-row work sharding on the SAME D devices
  fallback@3   the odd-mesh case halo cannot serve (8^3 grid, 8 % 3 != 0)

CPU timings are a proxy for the *ratio* (both paths are the same XLA ops
CPU vs TPU modulo kernel quality); the scatter-add-heavy backward that
makes the fallback slow is backend-independent in structure.

Usage: python tools/fallback_cost.py [n_side] [reps]
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

sys.path.insert(0, ".")


def timed(fn, x, reps):
    fn(x)  # compile + warm
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        out.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(out))


def main():
    from chargeflux_tpu.models import water_box
    from chargeflux_tpu.parallel.halo import make_halo_energy_fn
    from chargeflux_tpu.parallel.shard import _local_energy_builder
    from chargeflux_tpu.cells import suggest_capacity

    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    force, pos, _m, box = water_box(n_side=n_side, flux="bond_angle",
                                    cutoff=0.8)
    system = force.create_system(box=box, dtype=jnp.float32,
                                 direct_method="cell")
    cap = suggest_capacity(pos, box, system.spec.cell_grid, margin=1.05)
    if cap != system.spec.cell_capacity:
        system = force.create_system(box=box, dtype=jnp.float32,
                                     direct_method="cell", cell_capacity=cap)
    x = jnp.asarray(pos, jnp.float32)
    print(json.dumps({"n_atoms": system.n_atoms,
                      "grid": list(system.spec.cell_grid),
                      "cap": system.spec.cell_capacity}), flush=True)

    def fallback_fn(ndev):
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("space",))
        local = _local_energy_builder(system, "space", ndev)
        sharded = jax.shard_map(local, mesh=mesh, in_specs=P(),
                                out_specs=P(), check_vma=False)
        return jax.jit(jax.value_and_grad(sharded))

    def halo_fn(ndev):
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("space",))
        e = make_halo_energy_fn(system, mesh)
        return jax.jit(jax.value_and_grad(lambda xx: e(xx)))

    legs = [("halo@4", halo_fn(4)), ("fallback@4", fallback_fn(4)),
            ("halo@8", halo_fn(8)), ("fallback@8", fallback_fn(8)),
            ("fallback@3", fallback_fn(3))]
    for name, fn in legs:
        ms = timed(fn, x, reps)
        print(json.dumps({"leg": name, "ms_per_eval_cpu": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
