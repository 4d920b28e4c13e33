"""Measure the FFT+influence fwd+bwd cost of the PME epilogue at the 30k
bench mesh (60^3), isolated from the spread kernel, plus a matmul-DFT
alternative: on TPU, XLA lowers FFTs through a generic path — a 60-point
DFT as an explicit [G, G] complex matmul rides the MXU instead.
"""

import json
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timed_scan, build  # noqa: E402
from chargeflux_tpu.pme import influence_function  # noqa: E402


def main():
    x, system, _ = build("30k")
    spec = system.spec
    grid = spec.pme_grid
    gx, gy, gz = grid
    box = system.box
    d = influence_function(grid, box, spec.alpha, spec.pme_order, jnp.float32)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal(grid), jnp.float32)

    def e_fft(qg):
        qhat = jnp.fft.rfftn(qg)
        return jnp.sum(d * (qhat.real**2 + qhat.imag**2))

    # d in full (non-hermitian-reduced) layout for the matmul-DFT variant.
    # d already folds the rfft half-space weights (x2 on interior kz); with
    # the 0.5 * sum below, mirrored interior planes come out right and the
    # self-conjugate planes (kz = 0 and Nyquist) need an extra x2.
    dnp = np.asarray(d).astype(np.float64)
    dfull = np.zeros((gx, gy, gz))
    half = dnp.shape[-1]
    dfull[:, :, :half] = dnp
    dfull[:, :, 0] *= 2.0
    if gz % 2 == 0:
        dfull[:, :, gz // 2] *= 2.0
    for kz in range(half, gz):
        dfull[:, :, kz] = dnp[:, :, gz - kz]   # d is symmetric under k->-k
    dfull = jnp.asarray(dfull, jnp.float32)

    def dft_mat(n):
        k = np.arange(n)
        w = np.exp(-2j * np.pi * np.outer(k, k) / n)
        return (jnp.asarray(w.real, jnp.float32),
                jnp.asarray(w.imag, jnp.float32))

    mats = [dft_mat(n) for n in grid]
    PREC = jax.lax.Precision.HIGHEST

    def e_dft(qg):
        re, im = qg, jnp.zeros_like(qg)
        for ax, (wr, wi) in enumerate(mats):
            re2 = jnp.tensordot(re, wr, axes=([ax], [0])) - \
                jnp.tensordot(im, wi, axes=([ax], [0]))
            im2 = jnp.tensordot(re, wi, axes=([ax], [0])) + \
                jnp.tensordot(im, wr, axes=([ax], [0]))
            re = jnp.moveaxis(re2, -1, ax)
            im = jnp.moveaxis(im2, -1, ax)
        return 0.5 * jnp.sum(dfull * (re * re + im * im))

    def e_dft_hi(qg):
        re, im = qg, jnp.zeros_like(qg)
        for ax, (wr, wi) in enumerate(mats):
            re2 = jnp.tensordot(re, wr, axes=([ax], [0]), precision=PREC) - \
                jnp.tensordot(im, wi, axes=([ax], [0]), precision=PREC)
            im2 = jnp.tensordot(re, wi, axes=([ax], [0]), precision=PREC) + \
                jnp.tensordot(im, wr, axes=([ax], [0]), precision=PREC)
            re = jnp.moveaxis(re2, -1, ax)
            im = jnp.moveaxis(im2, -1, ax)
        return 0.5 * jnp.sum(dfull * (re * re + im * im))

    X3 = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3

    def e_dft_x3(qg):
        re, im = qg, jnp.zeros_like(qg)
        for ax, (wr, wi) in enumerate(mats):
            re2 = jnp.tensordot(re, wr, axes=([ax], [0]), precision=X3) - \
                jnp.tensordot(im, wi, axes=([ax], [0]), precision=X3)
            im2 = jnp.tensordot(re, wi, axes=([ax], [0]), precision=X3) + \
                jnp.tensordot(im, wr, axes=([ax], [0]), precision=X3)
            re = jnp.moveaxis(re2, -1, ax)
            im = jnp.moveaxis(im2, -1, ax)
        return 0.5 * jnp.sum(dfull * (re * re + im * im))

    # parity check first (CPU-correctness of the mirrored influence)
    e1 = float(e_fft(q0))
    e2 = float(e_dft(q0))
    e3 = float(e_dft_hi(q0))
    e4 = float(e_dft_x3(q0))
    print(f"# e_fft={e1:.6f} e_dft={e2:.6f} e_dft_hi={e3:.6f} "
          f"rel={abs(e2-e1)/abs(e1):.2e} rel_hi={abs(e3-e1)/abs(e1):.2e} "
          f"rel_x3={abs(e4-e1)/abs(e1):.2e}",
          file=sys.stderr)

    def grad_loop(f):
        @partial(jax.jit, static_argnums=(1,))
        def run(q, k):
            def step(qq, _):
                e, g = jax.value_and_grad(f)(qq)
                return qq - 1e-12 * g, e
            qk, es = jax.lax.scan(step, q, None, length=k)
            return es[-1] + 0.0 * jnp.sum(qk)

        return run

    runners = {"fft": grad_loop(e_fft), "dft_mat": grad_loop(e_dft),
               "dft_mat_highest": grad_loop(e_dft_hi),
               "dft_mat_x3": grad_loop(e_dft_x3)}
    out = {}
    for name, run in runners.items():
        out[name] = _timed_scan(run, q0, 2, 52, reps=5,
                                warm_s=10.0 if name == "fft" else 0.0)
    for name, ms in out.items():
        print(json.dumps({"piece": name, "ms_fwd_bwd": round(ms, 4)}))


if __name__ == "__main__":
    main()
