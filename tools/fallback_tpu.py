"""TPU cost of the work-sharding fallback formulation (VERDICT r3 item 6).

Real multi-chip is unavailable (one v5e), so measure the *formulation*
cost on a 1-device mesh: the fallback's gather-based cell-row walk
(scatter-add backward) vs the production roll/concat walk, full
energy+grad, same scan-difference methodology as bench.py.  Work sharding
is embarrassingly parallel (one psum), so a D-device mesh pays ~this/D —
the recorded ratio is what an odd mesh (prime grid, space=3) pays per
work item relative to the halo path.

Usage: python tools/fallback_tpu.py [n_side] [reps]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(0, ".")
from bench import _timed_scan, build, wait_for_backend  # noqa: E402


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    wait_for_backend()
    from chargeflux_tpu.energy import _energy
    from chargeflux_tpu.parallel.shard import _local_energy_builder

    cfg = {22: "30k", 32: "100k", 11: "4k"}.get(n_side, "30k")
    x, system, _masses = build(cfg)

    mesh = Mesh(np.array(jax.devices()[:1]), ("space",))
    local = _local_energy_builder(system, "space", 1)
    sharded = jax.shard_map(local, mesh=mesh, in_specs=P(), out_specs=P(),
                            check_vma=False)
    fallback_vg = jax.value_and_grad(sharded)

    def make_loop(vg):
        def loop(xx, k):
            def body(x_c, _):
                e, g = vg(x_c)
                return x_c - 1e-7 * g, e
            x_f, es = jax.lax.scan(body, xx, None, length=k)
            return es[-1] + 0.0 * jnp.sum(x_f)
        return jax.jit(loop, static_argnums=(1,))

    loops = {
        "roll_walk": make_loop(
            jax.value_and_grad(lambda z: _energy(z, system))),
        "fallback": make_loop(fallback_vg),
    }
    for _ in range(reps):
        for name, loop in loops.items():
            ms = _timed_scan(loop, x, 10, 60, reps=5)
            print(json.dumps({"leg": name, "config": cfg,
                              "ms_per_eval": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
