"""Shared test utilities: CoulForce -> oracle param dict conversion."""

from __future__ import annotations

import numpy as np


def force_to_params(force):
    n = force.getNumParticles()
    charges, sigmas, epsilons = [], [], []
    for i in range(n):
        q, s, e = force.getParticleParameters(i)
        charges.append(q)
        sigmas.append(s)
        epsilons.append(e)
    return dict(
        q0=np.array(charges),
        sigma=np.array(sigmas),
        epsilon=np.array(epsilons),
        exclusions=[force.getExceptionParameters(i)
                    for i in range(force.getNumExceptions())],
        bonds=[force.getFluxBondParameters(i)
               for i in range(force.getNumFluxBonds())],
        angles=[force.getFluxAngleParameters(i)
                for i in range(force.getNumFluxAngles())],
        waters=[force.getFluxWaterParameters(i)
                for i in range(force.getNumFluxWaters())],
    )
