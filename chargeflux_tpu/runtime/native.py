"""ctypes bindings to the native C++ host runtime (csrc/chargeflux_host.cpp).

Built on demand with g++ (no pybind11 in this environment; plain C ABI via
ctypes).  All entry points degrade gracefully: if no compiler is available
the callers fall back to NumPy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "chargeflux_host.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_chargeflux_host.so")


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    iptr = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.cf_cell_histogram.restype = ctypes.c_int
    lib.cf_cell_histogram.argtypes = [dptr, ctypes.c_int64, dptr, iptr, iptr]
    lib.cf_flux_charges.restype = None
    lib.cf_flux_charges.argtypes = [
        dptr, ctypes.c_int64, dptr, ctypes.c_int, dptr,
        iptr, dptr, ctypes.c_int64,
        iptr, dptr, ctypes.c_int64,
        iptr, dptr, ctypes.c_int64,
        dptr]
    lib.cf_direct_energy.restype = ctypes.c_double
    lib.cf_direct_energy.argtypes = [
        dptr, ctypes.c_int64, dptr, dptr, dptr, dptr,
        iptr, ctypes.c_int64, ctypes.c_double, ctypes.c_double, dptr, dptr]
    lib.cf_recip_self_energy.restype = ctypes.c_double
    lib.cf_recip_self_energy.argtypes = [
        dptr, ctypes.c_int64, dptr, dptr, iptr, ctypes.c_double,
        dptr, dptr]
    lib.cf_flux_chain_forces.restype = None
    lib.cf_flux_chain_forces.argtypes = [
        dptr, ctypes.c_int64, dptr, ctypes.c_int, dptr,
        iptr, dptr, ctypes.c_int64,
        iptr, dptr, ctypes.c_int64,
        iptr, dptr, ctypes.c_int64,
        dptr]
    lib.cf_dcd_open.restype = ctypes.c_void_p
    lib.cf_dcd_open.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                ctypes.c_double, ctypes.c_int32,
                                ctypes.c_int32]
    lib.cf_dcd_write_frame.restype = ctypes.c_int
    lib.cf_dcd_write_frame.argtypes = [ctypes.c_void_p, dptr,
                                       ctypes.c_void_p]
    lib.cf_dcd_close.restype = ctypes.c_int
    lib.cf_dcd_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def dcd_native_handle(path: str, n_atoms: int, dt_ps: float, nsavc: int,
                      with_cell: bool):
    """(lib, handle) for the native DCD writer, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.cf_dcd_open(str(path).encode(), int(n_atoms), float(dt_ps),
                        int(nsavc), int(bool(with_cell)))
    if not h:
        raise OSError(f"cannot open {path!r} for DCD writing")
    return lib, h


def native_available() -> bool:
    return _load() is not None


def cell_histogram(positions, box, grid):
    """Per-cell occupancy counts and max occupancy.  Native if available,
    NumPy fallback otherwise.  Returns (counts [gx*gy*gz], max)."""
    pos = np.ascontiguousarray(positions, np.float64)
    box = np.ascontiguousarray(box, np.float64)
    g = np.ascontiguousarray(grid, np.int32)
    lib = _load()
    if lib is not None:
        counts = np.zeros(int(g[0] * g[1] * g[2]), np.int32)
        mx = lib.cf_cell_histogram(pos, len(pos), box, g, counts)
        return counts, int(mx)
    frac = pos / box
    frac -= np.floor(frac)
    ci = np.minimum((frac * g).astype(np.int64), np.asarray(g, np.int64) - 1)
    flat = (ci[:, 0] * g[1] + ci[:, 1]) * g[2] + ci[:, 2]
    counts = np.bincount(flat, minlength=int(g[0] * g[1] * g[2])).astype(np.int32)
    return counts, int(counts.max())


def native_flux_charges(positions, box, pbc, q0, bonds, angles, waters):
    """Effective charges from the native oracle.  bonds: (idx [B,2], kb [B,2]);
    angles: (idx [A,3], kt [A,2]); waters: (idx [W,3], p [W,5])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    pos = np.ascontiguousarray(positions, np.float64)
    n = len(pos)
    q_out = np.zeros(n)
    b_idx, b_p = bonds
    a_idx, a_p = angles
    w_idx, w_p = waters
    lib.cf_flux_charges(
        pos, n, np.ascontiguousarray(box, np.float64), int(pbc),
        np.ascontiguousarray(q0, np.float64),
        np.ascontiguousarray(b_idx, np.int32).reshape(-1),
        np.ascontiguousarray(b_p, np.float64).reshape(-1), len(b_idx),
        np.ascontiguousarray(a_idx, np.int32).reshape(-1),
        np.ascontiguousarray(a_p, np.float64).reshape(-1), len(a_idx),
        np.ascontiguousarray(w_idx, np.int32).reshape(-1),
        np.ascontiguousarray(w_p, np.float64).reshape(-1), len(w_idx),
        q_out)
    return q_out


def native_recip_self_energy(positions, box, q, kmax, alpha, forces, dedq):
    """Classical-Ewald self + brute half-space reciprocal term (f64,
    native).  Adds the fixed-charge force and dE/dq contributions INTO
    ``forces``/``dedq`` in place; returns E_self + E_recip."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    pos = np.ascontiguousarray(positions, np.float64)
    assert forces.flags.c_contiguous and dedq.flags.c_contiguous
    return float(lib.cf_recip_self_energy(
        pos, len(pos), np.ascontiguousarray(box, np.float64),
        np.ascontiguousarray(q, np.float64),
        np.ascontiguousarray(kmax, np.int32), float(alpha),
        forces.reshape(-1), dedq))


def native_flux_chain_forces(positions, box, pbc, dedq, bonds, angles,
                             waters, forces):
    """Contract dE/dq against the analytic dq/dx (the multdQdX chain rule)
    and subtract from ``forces`` in place.  Argument conventions match
    :func:`native_flux_charges`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    pos = np.ascontiguousarray(positions, np.float64)
    b_idx, b_p = bonds
    a_idx, a_p = angles
    w_idx, w_p = waters
    lib.cf_flux_chain_forces(
        pos, len(pos), np.ascontiguousarray(box, np.float64), int(pbc),
        np.ascontiguousarray(dedq, np.float64),
        np.ascontiguousarray(b_idx, np.int32).reshape(-1),
        np.ascontiguousarray(b_p, np.float64).reshape(-1), len(b_idx),
        np.ascontiguousarray(a_idx, np.int32).reshape(-1),
        np.ascontiguousarray(a_p, np.float64).reshape(-1), len(a_idx),
        np.ascontiguousarray(w_idx, np.int32).reshape(-1),
        np.ascontiguousarray(w_p, np.float64).reshape(-1), len(w_idx),
        forces.reshape(-1))


def native_full_energy_forces(positions, box, q0, sigma, epsilon,
                              exclusions, bonds, angles, waters,
                              cutoff, alpha, kmax):
    """Full charge-flux Ewald ground truth, all-native: flux charges ->
    direct + exclusion -> self + reciprocal -> dE/dq chain rule.  The
    complete contract of ReferenceCoulKernels.cpp:424-636 at scales where
    the Python oracle is too slow.  Returns (energy, forces [N,3])."""
    q = native_flux_charges(positions, box, True, q0, bonds, angles,
                            waters)
    e_dir, forces, dedq = native_direct_energy(
        positions, box, q, sigma, epsilon, exclusions, cutoff, alpha)
    e_rs = native_recip_self_energy(positions, box, q, kmax, alpha,
                                    forces, dedq)
    native_flux_chain_forces(positions, box, True, dedq, bonds, angles,
                             waters, forces)
    return e_dir + e_rs, forces


def native_direct_energy(positions, box, q, sigma, epsilon, exclusions,
                         cutoff, alpha):
    """Direct-space + exclusion-correction energy/forces/dedq (f64, native).
    Returns (energy, forces [N,3], dedq [N])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    pos = np.ascontiguousarray(positions, np.float64)
    n = len(pos)
    forces = np.zeros((n, 3))
    dedq = np.zeros(n)
    excl = np.ascontiguousarray(exclusions, np.int32).reshape(-1)
    e = lib.cf_direct_energy(
        pos, n, np.ascontiguousarray(box, np.float64),
        np.ascontiguousarray(q, np.float64),
        np.ascontiguousarray(sigma, np.float64),
        np.ascontiguousarray(epsilon, np.float64),
        excl, len(exclusions), float(cutoff), float(alpha),
        forces.reshape(-1), dedq)
    return float(e), forces, dedq
