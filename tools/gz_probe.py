"""Probe the 9^3-grid ~2 ms cliff hypothesis (BASELINE.md, parked round 2).

Hypothesis: TPU tiles the last TWO dims of an array to (8 sublanes, 128
lanes); the cell-block arrays are [gx, gy, gz, cap], so gz sits on the
sublane dim — gz = 9/10 pads to 16 (+78%/+60% on every block-array
elementwise op and roll) while gz = 8 is exact and gz = 11 (100k) pads to
16 (+45%).

This microbench times the block-array op mix (elementwise chains + z/y
rolls, the walk's data plumbing) on [C, gy, gz, cap] stacks with gz in
{8, 9, 10, 11, 12, 16} at constant TOTAL element count (C adjusted), so a
pure-padding effect shows as time rising with pad(gz)/gz, not with size.

Run on the real TPU (no args). ~1 min. Prints one line per gz.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def op_mix(a, b):
    # the walk's block plumbing: rolls along the gz (sublane) and gy axes
    # plus an elementwise chain, mirroring cells.py's slab construction
    out = 0.0
    for sz, sy in ((1, 0), (-1, 0), (0, 1), (1, 1), (-1, 1)):
        rolled = jnp.roll(a, (sy, sz), axis=(1, 2))
        out = out + rolled * b + 0.25 * rolled * rolled
    return out.sum(dtype=jnp.float32)


def timed(fn, *args, reps=3, inner=60):
    # scan-difference timing per CLAUDE.md: the tunnel's block_until_ready
    # does not wait for remote completion
    def loop(n):
        # the carry must feed back into the op INPUTS or XLA hoists the
        # loop-invariant body out of the scan (CLAUDE.md measurement rule)
        def body(c, _):
            perturbed = (args[0] + c * 1e-20,) + args[1:]
            return c * 0.5 + fn(*perturbed), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    l_short = jax.jit(lambda: loop(inner // 3))
    l_long = jax.jit(lambda: loop(inner))
    float(l_short()); float(l_long())  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); float(l_short()); t1 = time.perf_counter()
        float(l_long()); t2 = time.perf_counter()
        per = ((t2 - t1) - (t1 - t0)) / (inner - inner // 3)
        best = min(best, per)
    return best * 1e3  # ms per op_mix


def main():
    cap = 88
    total = 16 * 128 * 8 * cap  # constant element budget
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}")
    for gz in (8, 9, 10, 11, 12, 16):
        gy = 8
        c = total // (gy * gz * cap)
        shape = (c, gy, gz, cap)
        a = jax.random.normal(key, shape, jnp.float32)
        b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
        ms = timed(op_mix, a, b)
        pad = -gz % 8
        n_el = c * gy * gz * cap
        print(f"gz={gz:2d} shape={shape} elems={n_el/1e6:.2f}M "
              f"pad(gz)->{gz + pad:2d} : {ms:.4f} ms "
              f"({ms / (n_el / 1e6):.5f} ms/Melem)")


if __name__ == "__main__":
    sys.exit(main())
