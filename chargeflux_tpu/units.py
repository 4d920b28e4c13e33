"""MD unit system constants.

The engine works in OpenMM's MD unit system: nanometers, picoseconds,
kJ/mol, elementary charge, atomic mass units (daltons).

Reference parity: the Coulomb constant matches OpenMM's ``ONE_4PI_EPS0``
imported by the reference plugin (ReferenceCoulKernels.cpp:7 via
SimTKOpenMMRealType.h; CudaCoulKernels.cpp:8).
"""

# Coulomb constant k_e = 1/(4*pi*eps0) in kJ/mol * nm / e^2.
ONE_4PI_EPS0 = 138.935456

# Boltzmann constant in kJ/(mol*K) — for thermostats / velocity init.
BOLTZ = 0.008314462618

# sqrt(pi), used by the Ewald self-energy term.
import math as _math

SQRT_PI = _math.sqrt(_math.pi)
