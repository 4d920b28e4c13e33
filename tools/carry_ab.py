"""A/B the packed-carry representation against the hetero scan residual.

Round-3 signature (BASELINE.md): a 24-atom solute costs +0.17 ms in raw
fwd+grad but +0.47 ms inside the MD scan — the extra remainder ops at the
loop boundary make XLA relayout the packed [N, 9] carry per iteration.
The remainder-side optimization_barrier was A/B'd and REJECTED (3.462 vs
3.391); this tool measures the CARRY-side candidates
(integrate.PACKED_CARRY_MODE):

  packed   [N, 9] carry (round-2 default, the control)
  barrier  [N, 9] + lax.optimization_barrier at each step boundary
  flat     [N*9] 1-D carry, canonical reshape inside the step

on both the pure-water 30k box and the s8 solvated-chain box,
same-process alternated per house methodology.

Usage: python tools/carry_ab.py [reps] [mode ...]
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import build_full, measure_md_step, wait_for_backend  # noqa: E402
from tools.hetero_ab import build_case  # noqa: E402

import chargeflux_tpu.integrate as integrate  # noqa: E402


def main():
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 2
    modes = [a for a in args if not a.isdigit()] or [
        "packed", "flat", "barrier"]
    wait_for_backend()
    cases = {}
    x, system, masses, force = build_full("30k")
    cases["water"] = (x, system, masses, force, None)
    cases["s8"] = build_case(8)

    acc = {}
    for _ in range(reps):
        for mode in modes:
            integrate.PACKED_CARRY_MODE = mode
            for name, (x, system, masses, force, bonded) in cases.items():
                ms, e, _ = measure_md_step(x, system, masses, force=force,
                                           bonded=bonded)
                assert np.isfinite(e), (mode, name)
                acc.setdefault((mode, name), []).append(ms)
                print(json.dumps({"mode": mode, "case": name,
                                  "ms_per_md_step": round(ms, 4)}),
                      flush=True)
    for (mode, name), vals in acc.items():
        print(json.dumps({"mode": mode, "case": name,
                          "median_ms": round(float(np.median(vals)), 4),
                          "all": [round(v, 3) for v in vals]}), flush=True)


if __name__ == "__main__":
    main()
