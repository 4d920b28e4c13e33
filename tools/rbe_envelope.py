"""RBE operating envelope (VERDICT r3 item 7): estimator noise and step
cost vs the batch size p, so the 15.7% 100k NVT win has a selection rule
behind it rather than one measured point.

For each p in the sweep, at the 100k bench config (relative to the PME
forces, whose own error is ~1e-5 — negligible against RBE noise):

  force_rmse_rel   RMS(F_rbe - F_pme) / RMS(F_pme) over a few draws —
                   directly comparable to the engine's 1e-4 f32 budget
  e_rec_std_rel    std over draws of the reciprocal energy estimate,
                   relative to |E_rec|
  ms_per_nvt_step  BAOAB NVT step time (same loop as tools/rbe_ab.py)

Usage: python tools/rbe_envelope.py [config] [p ...]   (default 100k,
p in 32 64 128 256; a pme timing leg is always included)
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import DT_PS, _timed_scan, build_full, wait_for_backend  # noqa: E402


def main():
    args = sys.argv[1:]
    config = args[0] if args and not args[0].isdigit() else "100k"
    ps = [int(a) for a in args if a.isdigit()] or [32, 64, 128, 256]
    wait_for_backend()

    from chargeflux_tpu.integrate import (init_state_nb,
                                          langevin_trajectory_nb,
                                          make_nb_energy_fn,
                                          maxwell_velocities)
    from chargeflux_tpu.models import water_bonded_params
    from chargeflux_tpu.neighbors import suggest_rebuild_interval
    from chargeflux_tpu.rbe import (make_rbe_nb_energy_fn,
                                    rbe_langevin_trajectory_nb)

    x, system, masses, _force = build_full(config)
    bonded = water_bonded_params(system.n_atoms // 3, box=np.asarray(
        jax.device_get(system.box)), dtype=jnp.float32)
    re = suggest_rebuild_interval(system, DT_PS, max_speed=24.0, cap=10)
    v0 = maxwell_velocities(masses, 150.0, jax.random.PRNGKey(0),
                            dtype=jnp.float32)
    e_fn_p, init_nb_p = make_nb_energy_fn(system, bonded=bonded)
    s0 = init_state_nb(x, v0, e_fn_p, init_nb_p)
    # thermalize before the accuracy legs: at the initial LATTICE the
    # structure factor has coherent Bragg peaks and the importance-sampled
    # estimator's variance is pathologically inflated (measured rel-RMSE
    # > 1 at every p); the operating envelope must be quoted at a liquid
    # state like production sampling runs
    s0, _ = langevin_trajectory_nb(s0, e_fn_p, init_nb_p, masses, DT_PS,
                                   150.0, 20.0, jax.random.PRNGKey(2),
                                   n_steps=120 * re, rebuild_every=re)

    # --- accuracy: full-force deviation + recip-energy spread per draw ---
    x = s0.positions
    f_ref = np.asarray(s0.forces, np.float64)
    rms_ref = float(np.sqrt(np.mean(f_ref ** 2)))
    for p in ps:
        e_fn_r, init_nb_r = make_rbe_nb_energy_fn(system, p, bonded=bonded)
        nb = init_nb_r(x)
        ef = jax.jit(e_fn_r)
        rmses, erecs = [], []
        for i in range(6):
            e_r, f_r, _ = ef(x, nb, jax.random.PRNGKey(100 + i))
            d = np.asarray(f_r, np.float64) - f_ref
            rmses.append(float(np.sqrt(np.mean(d ** 2))) / rms_ref)
            erecs.append(float(e_r))
        print(json.dumps({
            "p": p,
            "force_rmse_rel": [round(v, 6) for v in rmses],
            "force_rmse_rel_mean": round(float(np.mean(rmses)), 6),
            "e_tot_std_kj": round(float(np.std(erecs)), 2),
        }), flush=True)

    # --- cost: NVT ms/step per p, alternated with the PME control -------
    def make_run_pme():
        def run(state, k):
            _s, kes = langevin_trajectory_nb(
                state, e_fn_p, init_nb_p, masses, DT_PS, 150.0, 20.0,
                jax.random.PRNGKey(1), n_steps=k * re, rebuild_every=re)
            return kes[-1]
        return jax.jit(run, static_argnums=(1,))

    def make_run_rbe(p):
        e_fn_r, init_nb_r = make_rbe_nb_energy_fn(system, p, bonded=bonded)

        def run(state, k):
            _s, kes = rbe_langevin_trajectory_nb(
                state, e_fn_r, init_nb_r, masses, DT_PS, 150.0, 20.0,
                jax.random.PRNGKey(1), n_steps=k * re, rebuild_every=re)
            return kes[-1]
        return jax.jit(run, static_argnums=(1,))

    runs = [("pme", None, make_run_pme())] + [
        (f"rbe_p{p}", p, make_run_rbe(p)) for p in ps]
    k1 = max(1, 10 // re)
    for rep in range(2):
        for name, p, run in runs:
            ms = _timed_scan(run, s0, k1, 6 * k1, reps=5) / re
            print(json.dumps({"kind": name, "p": p, "config": config,
                              "ms_per_nvt_step": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
