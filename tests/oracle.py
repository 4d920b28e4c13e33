"""Independent NumPy float64 oracle for the charge-flux physics contract.

A from-scratch implementation of the behavior specified by the reference
plugin (SURVEY.md §0; ReferenceCoulKernels.cpp:37-636), used as the ground
truth the JAX engine is validated against.  Deliberately simple and loopy —
clarity over speed.

Covers: effective charges q(x) with bond/angle/water flux terms and their
analytic Jacobian; non-periodic all-pairs Coulomb+LJ with exclusions;
periodic classical Ewald (self + half-space reciprocal + cutoff direct erfc +
exclusion erf correction); forces including the dE/dq chain rule.
"""

from __future__ import annotations

import math

import numpy as np

ONE_4PI_EPS0 = 138.935456


def min_image(d, box):
    if box is None:
        return d
    return d - box * np.floor(d / box + 0.5)


def compute_charges(pos, params, box=None):
    """Effective charges and the dense Jacobian dq/dx [N, N, 3].

    params: dict with q0, bonds [(p1,p2,k,b)], angles [(p1,p2,p3,k,theta0)],
    waters [(O,H1,H2,k1,k2,kub,b0,ub0)].
    """
    q = np.array(params["q0"], dtype=np.float64).copy()
    n = len(q)
    dqdx = np.zeros((n, n, 3))

    for (p1, p2, k, b) in params.get("bonds", []):
        d = min_image(pos[p2] - pos[p1], box)
        r = math.sqrt(d @ d)
        dq = k * (r - b)
        q[p1] += dq
        q[p2] -= dq
        val = (k / r) * d
        dqdx[p1, p1] += -val
        dqdx[p1, p2] += val
        dqdx[p2, p1] += val
        dqdx[p2, p2] += -val

    for (p1, p2, p3, k, theta0) in params.get("angles", []):
        d21 = min_image(pos[p1] - pos[p2], box)
        d23 = min_image(pos[p3] - pos[p2], box)
        d13 = min_image(pos[p3] - pos[p1], box)
        r21 = math.sqrt(d21 @ d21)
        r23 = math.sqrt(d23 @ d23)
        r13_2 = d13 @ d13
        cost = (r23 * r23 + r21 * r21 - r13_2) / (2 * r21 * r23)
        theta = math.acos(cost)
        dq = k * (theta - theta0)
        q[p1] += dq
        q[p3] += dq
        q[p2] -= 2 * dq
        sin_inv = 1.0 / math.sqrt(1 - cost * cost)
        c1 = k / (r21 * r23) * sin_inv
        c2_21 = k * cost * sin_inv / (r21 * r21)
        c2_23 = k * cost * sin_inv / (r23 * r23)
        v1 = -c1 * d23 + c2_21 * d21
        v3 = -c1 * d21 + c2_23 * d23
        v2 = -v1 - v3
        dqdx[p1, p1] += v1
        dqdx[p1, p2] += v2
        dqdx[p1, p3] += v3
        dqdx[p2, p1] += -2 * v1
        dqdx[p2, p2] += -2 * v2
        dqdx[p2, p3] += -2 * v3
        dqdx[p3, p1] += v1
        dqdx[p3, p2] += v2
        dqdx[p3, p3] += v3

    for (pO, pH1, pH2, k1, k2, kub, b0, ub0) in params.get("waters", []):
        d12 = min_image(pos[pH1] - pos[pO], box)
        d13 = min_image(pos[pH2] - pos[pO], box)
        d23 = min_image(pos[pH2] - pos[pH1], box)
        r12 = math.sqrt(d12 @ d12)
        r13 = math.sqrt(d13 @ d13)
        r23 = math.sqrt(d23 @ d23)
        dq2 = k1 * (r12 - b0) + k2 * (r13 - b0) + kub * (r23 - ub0)
        dq3 = k1 * (r13 - b0) + k2 * (r12 - b0) + kub * (r23 - ub0)
        dq1 = -dq2 - dq3
        q[pO] += dq1
        q[pH1] += dq2
        q[pH2] += dq3
        n12, n13, n23 = d12 / r12, d13 / r13, d23 / r23
        ub = kub * n23
        dqdx[pO, pO] += (k1 + k2) * n12 + (k1 + k2) * n13
        dqdx[pO, pH1] += -(k1 + k2) * n12 + 2 * ub
        dqdx[pO, pH2] += -(k1 + k2) * n13 - 2 * ub
        dqdx[pH1, pO] += -k1 * n12 - k2 * n13
        dqdx[pH1, pH1] += k1 * n12 - ub
        dqdx[pH1, pH2] += k2 * n13 + ub
        dqdx[pH2, pO] += -k2 * n12 - k1 * n13
        dqdx[pH2, pH1] += k2 * n12 - ub
        dqdx[pH2, pH2] += k1 * n13 + ub

    return q, dqdx


def _lj(si, ei, sj, ej, inv_r):
    sig = 0.5 * (si + sj)
    sig6 = (sig * inv_r) ** 6
    eps = 4.0 * math.sqrt(ei * ej)
    e = eps * sig6 * (sig6 - 1.0)
    # dE/dr * r factored as in the reference: (eps*sig6*(12 sig6 - 6)) / r^2
    dedr_over_r = eps * sig6 * (12 * sig6 - 6) * inv_r * inv_r
    return e, dedr_over_r


def energy_forces_nopbc(pos, params):
    """Non-periodic all-pairs Coulomb + LJ with exclusions and charge-flux
    chain-rule forces.  Returns (energy, forces [N,3])."""
    n = len(pos)
    q, dqdx = compute_charges(pos, params)
    sig = np.asarray(params["sigma"], dtype=np.float64)
    eps = np.asarray(params["epsilon"], dtype=np.float64)
    excl = {tuple(sorted(e)) for e in params.get("exclusions", [])}

    energy = 0.0
    forces = np.zeros((n, 3))
    dedq = np.zeros(n)
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in excl:
                # The reference adds every pair then subtracts excluded ones
                # (ReferenceCoulKernels.cpp:438-491) — net zero contribution.
                continue
            d = pos[j] - pos[i]
            r = math.sqrt(d @ d)
            inv_r = 1.0 / r
            e_lj, dedr_or = _lj(sig[i], eps[i], sig[j], eps[j], inv_r)
            e_c = ONE_4PI_EPS0 * q[i] * q[j] * inv_r
            energy += e_c + e_lj
            dEdR = dedr_or + e_c * inv_r * inv_r
            forces[i] -= dEdR * d
            forces[j] += dEdR * d
            dedq[i] += ONE_4PI_EPS0 * q[j] * inv_r
            dedq[j] += ONE_4PI_EPS0 * q[i] * inv_r

    forces -= np.einsum("i,ijd->jd", dedq, dqdx)
    return energy, forces


def ewald_alpha_kmax(cutoff, tol, box):
    alpha = math.sqrt(-math.log(2 * tol)) / cutoff
    kmax = []
    for w in box:
        k = 1
        while 0.05 * math.sqrt(w * alpha) * k * math.exp(-(k * math.pi / (w * alpha)) ** 2) > tol:
            k += 1
        if k % 2 == 0:
            k += 1
        kmax.append(k)
    return alpha, kmax


def energy_forces_pbc(pos, params, box, cutoff, tol):
    """Periodic classical Ewald with charge flux.  Returns
    (energy, forces, components dict)."""
    n = len(pos)
    box = np.asarray(box, dtype=np.float64)
    q, dqdx = compute_charges(pos, params, box)
    sig = np.asarray(params["sigma"], dtype=np.float64)
    eps = np.asarray(params["epsilon"], dtype=np.float64)
    excl = {tuple(sorted(e)) for e in params.get("exclusions", [])}
    alpha, (kmx, kmy, kmz) = ewald_alpha_kmax(cutoff, tol, box)

    forces = np.zeros((n, 3))
    dedq = np.zeros(n)

    # self
    e_self = -ONE_4PI_EPS0 * alpha / math.sqrt(math.pi) * np.sum(q * q)
    dedq += -2 * ONE_4PI_EPS0 * alpha / math.sqrt(math.pi) * q

    # reciprocal: exact half-space enumeration of the reference
    # (kx in [0,kmax); for kx==0 only half the (ky,kz) plane).
    recip = 2 * math.pi / box
    const = 4 * math.pi * ONE_4PI_EPS0 / (box[0] * box[1] * box[2])
    e_rec = 0.0
    minky, minkz = 0, 1
    for nkx in range(kmx):
        kx = nkx * recip[0]
        for nky in range(minky, kmy):
            ky = nky * recip[1]
            for nkz in range(minkz, kmz):
                kz = nkz * recip[2]
                k2 = kx * kx + ky * ky + kz * kz
                eak = math.exp(-k2 / (4 * alpha * alpha)) / k2
                gr = kx * pos[:, 0] + ky * pos[:, 1] + kz * pos[:, 2]
                cg, sg = np.cos(gr), np.sin(gr)
                cs = float(q @ cg)
                ss = float(q @ sg)
                gradr = 2 * const * eak * (ss * q * cg - cs * q * sg)
                forces[:, 0] -= gradr * kx
                forces[:, 1] -= gradr * ky
                forces[:, 2] -= gradr * kz
                dedq += 2 * const * eak * (cs * cg + ss * sg)
                e_rec += const * eak * (cs * cs + ss * ss)
            minkz = 1 - kmz
        minky = 1 - kmy

    # direct space within cutoff, excluded pairs skipped
    e_dir = 0.0
    two_over_sqrtpi = 2.0 / math.sqrt(math.pi)
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in excl:
                continue
            d = min_image(pos[i] - pos[j], box)
            r2 = d @ d
            if r2 >= cutoff * cutoff:
                continue
            r = math.sqrt(r2)
            inv_r = 1.0 / r
            ar = alpha * r
            e_lj, dedr_or = _lj(sig[i], eps[i], sig[j], eps[j], inv_r)
            qq = ONE_4PI_EPS0 * q[i] * q[j]
            e_dir += qq * inv_r * math.erfc(ar) + e_lj
            dEdR = qq * inv_r ** 3 * (math.erfc(ar) + ar * math.exp(-ar * ar) * two_over_sqrtpi)
            dEdR += dedr_or
            forces[i] += dEdR * d
            forces[j] -= dEdR * d
            dedq[i] += ONE_4PI_EPS0 * q[j] * inv_r * math.erfc(ar)
            dedq[j] += ONE_4PI_EPS0 * q[i] * inv_r * math.erfc(ar)

    # exclusion correction (-erf), unconditional
    e_excl = 0.0
    for (i, j) in sorted(excl):
        d = min_image(pos[i] - pos[j], box)
        r = math.sqrt(d @ d)
        inv_r = 1.0 / r
        ar = alpha * r
        qq = ONE_4PI_EPS0 * q[i] * q[j]
        e_excl -= qq * inv_r * math.erf(ar)
        dEdR = qq * inv_r ** 3 * (math.erf(ar) - ar * math.exp(-ar * ar) * two_over_sqrtpi)
        forces[i] -= dEdR * d
        forces[j] += dEdR * d
        dedq[i] -= ONE_4PI_EPS0 * q[j] * inv_r * math.erf(ar)
        dedq[j] -= ONE_4PI_EPS0 * q[i] * inv_r * math.erf(ar)

    forces -= np.einsum("i,ijd->jd", dedq, dqdx)
    comps = {"self": e_self, "reciprocal": e_rec, "direct": e_dir,
             "exclusion": e_excl}
    return e_self + e_rec + e_dir + e_excl, forces, comps
