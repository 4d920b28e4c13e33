"""Fast erfc for the f32 production path.

jax.scipy.special.erfc lowers to a high-degree rational approximation sized
for double precision; at f32 the Abramowitz & Stegun 7.1.26 polynomial
(max abs error 1.5e-7) is an order of magnitude cheaper and is the same
family of approximation the reference's CUDA float path uses
(PBCForce.cu:200-205).  Autodiff of the polynomial gives an equally cheap,
smooth derivative.

f64 inputs fall through to the exact erfc so the double-precision parity
path stays bit-faithful.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erfc as _erfc_exact

_P = 0.3275911
_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429


def erfc_fast(x):
    """erfc(x) for x >= 0 (pair distances are nonnegative)."""
    if x.dtype == jnp.float64:
        return _erfc_exact(x)
    t = 1.0 / (1.0 + _P * x)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    return poly * jnp.exp(-x * x)
