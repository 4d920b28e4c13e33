"""Same-process alternated A/B: 30k headline rc 0.8 vs rc 0.72 g8.

VERDICT r4 item 2: the bench family was flipped to the rc-0.72
splitting-knob config on a sequential cross-process table whose delta
(0.18 ms) sits inside the documented ~10% fresh-process drift band, and
the round-4 driver capture showed no win — though that capture is now
known to have measured the 9^3-reverted program (_with_capacity dropped
cell_grid before the ADVICE-r4 fix).  This tool settles it per house
methodology: both configs built in ONE process, measure_md_step
alternated A/B/A/B for `reps` rounds.

Usage: python tools/rc_ab_30k.py [reps]
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import build_full, measure_md_step, wait_for_backend  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    wait_for_backend()
    cases = {
        # rc 0.8: the pre-round-4 headline; derived grid is already 8^3
        "rc08": build_full("30k", cutoff=0.8),
        # rc 0.72 on the forced 8^3 grid: the flipped splitting-knob config
        "rc072g8": build_full("30k"),
    }
    for name, (x, system, _m, _f) in cases.items():
        print(json.dumps({"case": name, "rc": system.spec.cutoff,
                          "grid": list(system.spec.cell_grid),
                          "cap": system.spec.cell_capacity,
                          "pme": list(system.spec.pme_grid)}), flush=True)
    acc = {}
    for _ in range(reps):
        for name, (x, system, masses, force) in cases.items():
            ms, e, _ = measure_md_step(x, system, masses, force=force)
            assert np.isfinite(e), name
            acc.setdefault(name, []).append(ms)
            print(json.dumps({"case": name,
                              "ms_per_md_step": round(ms, 4)}), flush=True)
    for name, vals in acc.items():
        print(json.dumps({"case": name,
                          "median_ms": round(float(np.median(vals)), 4),
                          "all": [round(v, 4) for v in vals]}), flush=True)


if __name__ == "__main__":
    main()
