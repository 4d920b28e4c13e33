"""Scene specification: builder API + immutable pytree system.

This module replaces the reference plugin's ``CoulForce`` parameter
container (openmmapi/include/CoulForce.h:16-150, openmmapi/src/CoulForce.cpp)
and the per-platform ``initialize`` unpacking
(platforms/reference/src/ReferenceCoulKernels.cpp:230-422,
platforms/cuda/src/CudaCoulKernels.cpp:57-520).

Two layers:

* :class:`CoulForce` — a mutable builder with the exact method surface of the
  reference's C++/SWIG API (addParticle / addException / addFluxBond /
  addFluxAngle / addFluxWater / cutoff / Ewald tolerance / PBC flag).
* :class:`ChargeFluxSystem` — a frozen JAX pytree produced by
  :meth:`CoulForce.create_system`.  Array leaves are dynamic (traced);
  everything shape- or compile-relevant (PBC flag, Ewald alpha/kmax, cell-list
  geometry) lives in hashable static metadata, mirroring how the reference
  bakes NUM_ATOMS / KMAX_* / EWALD_ALPHA into CUDA kernel macros at context
  creation (CudaCoulKernels.cpp:377-389, 466-506) — the reference's analog of
  XLA trace-time specialization.

Boxes are length-3 vectors of edge lengths in nm (orthorhombic — the
reference's hard assumption, ReferenceCoulKernels.cpp:513-517), or, as an
extension beyond the reference, a [3, 3] matrix of row lattice vectors in
reduced lower-triangular form (triclinic).  Every production route takes
triclinic lattices: fractional-coordinate cell walk with lattice-row image
offsets (cells.py), classical Ewald / PME reciprocal (Gram-matrix k^2,
fractional spread), halo sharding, and the dense routes; cell grids are
sized against the lattice's perpendicular plane widths.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .topology import TemplateSet, detect_templates


# ---------------------------------------------------------------------------
# Ewald parameter derivation (trace-time, pure Python)
# ---------------------------------------------------------------------------


def _ewald_param_value(kmax: int, width: float, alpha: float) -> float:
    """Error estimate for a candidate kmax.

    Same heuristic as the reference (ReferenceCoulKernels.cpp:32-35 and
    CudaCoulKernels.cpp:49-52) — OpenMM's classic Ewald kmax formula.
    """
    temp = kmax * math.pi / (width * alpha)
    return 0.05 * math.sqrt(width * alpha) * kmax * math.exp(-temp * temp)


def ewald_alpha(cutoff: float, tol: float) -> float:
    """alpha = sqrt(-log(2*tol)) / cutoff  (ReferenceCoulKernels.cpp:401)."""
    return math.sqrt(-math.log(2.0 * tol)) / cutoff


def box_widths(box_arr: np.ndarray) -> Tuple[float, float, float]:
    """Perpendicular widths (lattice-plane spacings) of a box.

    For a [3] orthorhombic box these are the edge lengths; for a [3, 3]
    row-vector lattice matrix B, width_i = 1 / ||inv(B)[:, i]|| (column i
    of the inverse is the plane normal with a_i . col_i = 1).  These are
    the lengths that enter the Ewald kmax / PME-mesh accuracy heuristics
    and the minimum-image validity bound.
    """
    if box_arr.ndim == 2:
        inv = np.linalg.inv(box_arr)
        return tuple(1.0 / np.linalg.norm(inv[:, i]) for i in range(3))
    return tuple(float(b) for b in box_arr)


def _validate_reduced_box(b: np.ndarray):
    """Triclinic boxes must be in reduced lower-triangular row-vector form
    (OpenMM's convention): a = (ax,0,0), b = (bx,by,0), c = (cx,cy,cz) with
    positive diagonal and off-diagonals no larger than half the earlier
    diagonals.  Any lattice can be rotated/relabeled into this form."""
    if not np.allclose([b[0, 1], b[0, 2], b[1, 2]], 0.0):
        raise ValueError(
            "triclinic box must be lower-triangular (row lattice vectors "
            "a=(ax,0,0), b=(bx,by,0), c=(cx,cy,cz)); rotate your cell")
    if not (b[0, 0] > 0 and b[1, 1] > 0 and b[2, 2] > 0):
        raise ValueError("triclinic box diagonal must be positive")
    tol = 1e-9
    if (abs(b[1, 0]) > 0.5 * b[0, 0] + tol
            or abs(b[2, 0]) > 0.5 * b[0, 0] + tol
            or abs(b[2, 1]) > 0.5 * b[1, 1] + tol):
        raise ValueError(
            "triclinic box is not in reduced form (|b_x|<=a_x/2, "
            "|c_x|<=a_x/2, |c_y|<=b_y/2); subtract integer multiples of "
            "earlier rows (lattice-preserving) to reduce it")


def dispersion_tail_coefficient(sigma, epsilon, cutoff: float) -> float:
    """Isotropic long-range LJ dispersion (tail) coefficient C [kJ/mol nm^3].

    ``E_tail = C / V`` with
    ``C = 2 pi sum_{i != j} 4 eps_ij [ sig_ij^12/(9 rc^9) - sig_ij^6/(3 rc^3) ]``
    (Lorentz-Berthelot mixing, g(r) = 1 beyond the cutoff — the standard
    homogeneous-fluid correction, cf. Allen & Tildesley eq. 2.134).  The
    reference plugin truncates LJ with no correction at all
    (ReferenceCoulKernels.cpp:572-577 stops at the cutoff); this is an
    opt-in extension (``CoulForce.setUseDispersionCorrection``).

    The double pair sum is evaluated *exactly* in O(N) via the binomial
    expansion of ``(sig_i + sig_j)^p``: with ``a_i = 2 sqrt(eps_i)`` and
    moments ``M_k = sum_i a_i sig_i^k``,
    ``sum_{i!=j} a_i a_j sig_ij^p
      = 2^-p [ sum_k C(p,k) M_k M_{p-k} - sum_i a_i^2 (2 sig_i)^p ]``.
    Exclusions are deliberately ignored (they are short-ranged bonded
    pairs; their g(r) never reaches the tail region) — same convention as
    OpenMM's NonbondedForce dispersion correction.
    """
    sig = np.asarray(sigma, dtype=np.float64).reshape(-1)
    a = 2.0 * np.sqrt(np.asarray(epsilon, dtype=np.float64).reshape(-1))

    def pair_sum(p: int) -> float:
        mom = [float(np.sum(a * sig ** k)) for k in range(p + 1)]
        full = sum(math.comb(p, k) * mom[k] * mom[p - k] for k in range(p + 1))
        self_pairs = float(np.sum(a * a * (2.0 * sig) ** p))
        return (full - self_pairs) / 2.0 ** p

    rc3 = float(cutoff) ** 3
    rc9 = rc3 ** 3
    return 2.0 * math.pi * (pair_sum(12) / (9.0 * rc9)
                            - pair_sum(6) / (3.0 * rc3))


def ewald_kmax(box: Tuple[float, float, float], alpha: float, tol: float) -> Tuple[int, int, int]:
    """Per-axis kmax grown until the error estimate drops below tol, then
    forced odd — including the reference's force-odd quirk
    (ReferenceCoulKernels.cpp:403-420)."""
    out = []
    for w in box:
        k = 1
        while _ewald_param_value(k, float(w), alpha) > tol:
            k += 1
        if k % 2 == 0:
            k += 1
        out.append(k)
    return tuple(out)


# ---------------------------------------------------------------------------
# Static (hashable) compile-time spec
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StaticSpec:
    """Hashable trace-time metadata for a ChargeFluxSystem.

    Everything here is baked into the compiled XLA program, exactly as the
    reference bakes the same quantities into NVRTC kernel macros
    (CudaCoulKernels.cpp:466-506).
    """

    pbc: bool
    cutoff: float
    ewald_tol: float
    # Ewald parameters; None when pbc is False.
    alpha: Optional[float]
    kmax: Optional[Tuple[int, int, int]]
    # Direct-space evaluation strategy: "dense" masked all-pairs or "cell"
    # (fixed-capacity cell list). noPBC is always dense all-pairs.
    direct_method: str = "dense"
    cell_grid: Optional[Tuple[int, int, int]] = None
    cell_capacity: Optional[int] = None
    # Cell-walk pair-tile layout: "shift" = 14 per-shift [cap, cap] tiles
    # (each j axis padded to the 128 vector lanes); "concat" = one
    # [cap, 14*cap] tile with the half-shell j-slabs concatenated along the
    # lane axis, so lane padding is paid once.  Measured winner everywhere
    # (3.62 vs 3.96 ms at the 30k bench even at cap=128, and it un-deadens
    # every sub-128-cap cutoff config — BASELINE.md cutoff-scan): concat is
    # the create_system default ("auto" resolves to it).
    walk_layout: str = "concat"
    # Number of slices of the leading (x) cell axis the concat/ifull walk
    # scans over (1 = one unchunked tile).  Bounds live pair-tile memory to
    # tile_bytes / walk_chunks; create_system sizes it so the tile stays
    # under ~320 MB (the unchunked 100k concat tile OOMed a 16 GB chip).
    walk_chunks: int = 1
    # Reciprocal-space route: "auto" (PME on TPU f32, else xla), "xla"
    # (classical Ewald, factorized matmuls), "pallas" (classical, fused tile
    # kernel) or "pme" (smooth particle-mesh Ewald, pme.py).
    recip_method: str = "auto"
    # SPME mesh (per axis) and B-spline order; derived from (box, alpha,
    # ewald_tol) at build time.  None when pbc is False.
    pme_grid: Optional[Tuple[int, int, int]] = None
    pme_order: int = 6
    # Extra per-axis mesh points each cell-blocked PME patch must extend so
    # that atoms drifting up to skin/2 past their rebuild-time cell (the
    # bound the neighbor-state freshness guard enforces) keep full B-spline
    # support: ceil((skin/2) / mesh_spacing) per side.  (0, 0, 0) when the
    # cell route is off.
    pme_slack: Tuple[int, int, int] = (0, 0, 0)
    # Long-range LJ dispersion tail coefficient C (kJ/mol nm^3): the energy
    # gains C / V(box).  None when the correction is off (the default — the
    # reference plugin has no such correction) or the system is non-periodic.
    tail_coeff: Optional[float] = None
    # Detected repeating molecular structure (topology.py): a TemplateSet —
    # a list of non-overlapping repeated blocks (solvent) plus per-kind
    # remainder rows (solute/ions) that keep the general scatter path.
    # Enables the gather/scatter-free template paths for flux charges and
    # exclusions.  None when nothing repeats enough to template.
    flux_template: Optional["TemplateSet"] = None
    excl_template: Optional["TemplateSet"] = None


# ---------------------------------------------------------------------------
# The system pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ChargeFluxSystem:
    """Immutable scene spec consumed by the energy/force functions.

    Array fields are pytree children (dynamic under jit).  ``spec`` is static
    metadata.  Field layout mirrors the flat vectors of the reference's
    CoulForce container (CoulForce.h:137-149), with fixed [T, k] shapes
    instead of strided flat arrays.
    """

    # Per-particle parameters (CoulForce.cpp:18-22).
    q0: jax.Array          # [N]   base charges (e)
    sigma: jax.Array       # [N]   LJ sigma (nm)
    epsilon: jax.Array     # [N]   LJ epsilon (kJ/mol)

    # Exclusions, both orders NOT duplicated: [E, 2] with p1 < p2 enforced at
    # build (the reference stores one order and symmetrizes into per-atom sets,
    # ReferenceCoulKernels.cpp:385-391).
    exclusions: jax.Array  # [E, 2] int32

    # Flux bonds (CoulForce.cpp:78-83): q_p1 += k (r12 - b), q_p2 -= ...
    bond_idx: jax.Array     # [B, 2] int32
    bond_k: jax.Array       # [B]
    bond_b: jax.Array       # [B]

    # Flux angles (CoulForce.cpp:96-102): dq = k (theta - theta0).
    angle_idx: jax.Array    # [A, 3] int32
    angle_k: jax.Array      # [A]
    angle_theta0: jax.Array  # [A]

    # Flux waters (CoulForce.cpp:116-125): (O, H1, H2) + (k1,k2,kub,b0,ub0).
    water_idx: jax.Array    # [W, 3] int32
    water_k1: jax.Array     # [W]
    water_k2: jax.Array     # [W]
    water_kub: jax.Array    # [W]
    water_b0: jax.Array     # [W]
    water_ub0: jax.Array    # [W]

    # Orthorhombic box edge lengths [3] (nm); zeros when non-periodic.
    box: jax.Array

    spec: StaticSpec = dataclasses.field(metadata=dict(static=True))

    # -- convenience ---------------------------------------------------------

    @property
    def n_atoms(self) -> int:
        return self.q0.shape[0]

    @property
    def n_exclusions(self) -> int:
        return self.exclusions.shape[0]

    def astype(self, dtype) -> "ChargeFluxSystem":
        """Cast all float leaves to ``dtype`` (int leaves untouched)."""

        def cast(x):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        return jax.tree.map(cast, self)

    def with_box(self, box) -> "ChargeFluxSystem":
        """Same system with a new (traced) orthorhombic box.

        The box is a pytree *leaf*, so this works under jit without
        recompiling — the basis of constant-pressure support (npt.py):
        a Monte-Carlo volume move is just ``system.with_box(s * box)``
        inside the compiled step.  The static spec (alpha, kmax, PME grid,
        cell grid/capacity) was derived from the creation-time box and is
        deliberately NOT recomputed; it stays valid for small volume
        changes.  On the cell route the energy path NaN-poisons when the
        box shrinks below ``grid * cutoff`` validity (energy.py) — the
        ~5% Verlet-skin reserve in the grid sizing is the shrink budget.
        Growing the box only degrades Ewald accuracy gradually (kmax and
        the PME grid were tuned for the original volume).

        A [3, 3] lattice matrix may be passed for a system built with an
        orthorhombic box (e.g. the strain-derivative pressure tensor,
        npt.pressure_tensor) — the shape change retraces, so do that
        outside a hot loop.
        """
        box = jnp.asarray(box, self.box.dtype)
        if box.shape != self.box.shape:
            if box.shape == (3,) and self.box.shape == (3, 3):
                # orthorhombic intent on a triclinic-built system: a raw
                # broadcast would fabricate a sheared lattice with three
                # identical rows — diagonalize instead
                box = jnp.diag(box)
            elif box.shape != (3, 3):
                box = jnp.broadcast_to(box, self.box.shape)
        return dataclasses.replace(self, box=box)

    def with_particle_parameters(self, q0=None, sigma=None,
                                 epsilon=None) -> "ChargeFluxSystem":
        """Same system with swapped per-particle parameters.

        The OpenMM ``updateParametersInContext`` analog: parameters are
        pytree *leaves*, so a same-shaped swap reuses the compiled energy
        without retracing (free-energy perturbation, parameter fitting,
        alchemical scans).  Shapes must match the original arrays.

        When the dispersion tail correction is active and sigma/epsilon
        change, the static tail coefficient is recomputed — this needs
        concrete (non-traced) values and changes the StaticSpec, i.e. it
        recompiles; call it outside jit in that case.
        """
        new = {}
        for name, val in (("q0", q0), ("sigma", sigma), ("epsilon", epsilon)):
            if val is None:
                continue
            old = getattr(self, name)
            arr = jnp.asarray(val, old.dtype)
            if arr.shape != old.shape:
                raise ValueError(
                    f"{name} shape {arr.shape} != {old.shape}; particle "
                    f"count is a compile-time constant")
            new[name] = arr
        if self.spec.tail_coeff is not None and (
                sigma is not None or epsilon is not None):
            sig = np.asarray(new.get("sigma", self.sigma))
            eps = np.asarray(new.get("epsilon", self.epsilon))
            new["spec"] = dataclasses.replace(
                self.spec, tail_coeff=dispersion_tail_coefficient(
                    sig, eps, self.spec.cutoff))
        return dataclasses.replace(self, **new)


# ---------------------------------------------------------------------------
# Builder with the reference's API surface
# ---------------------------------------------------------------------------


class CoulForce:
    """Builder mirroring the reference ``CoulPlugin::CoulForce`` API.

    Defaults match CoulForce.cpp:12-16: cutoff 1.0 nm, ewaldTol 1e-4,
    non-periodic.  Unlike the reference (which has no bounds checking at all,
    SURVEY §5 quirk 4) all index arguments are validated.
    """

    def __init__(self):
        self._charges: list[float] = []
        self._sigmas: list[float] = []
        self._epsilons: list[float] = []
        self._exclusions: list[tuple[int, int]] = []
        self._bonds: list[tuple[int, int, float, float]] = []
        self._angles: list[tuple[int, int, int, float, float]] = []
        self._waters: list[tuple[int, int, int, float, float, float, float, float]] = []
        self._cutoff = 1.0
        self._ewald_tol = 1e-4
        self._pbc = False
        self._use_dispersion = False

    # -- particles (CoulForce.cpp:18-43) -------------------------------------

    def addParticle(self, charge: float, sigma: float, epsilon: float) -> int:
        self._charges.append(float(charge))
        self._sigmas.append(float(sigma))
        self._epsilons.append(float(epsilon))
        return len(self._charges) - 1

    def getNumParticles(self) -> int:
        return len(self._charges)

    def getParticleParameters(self, index: int):
        return self._charges[index], self._sigmas[index], self._epsilons[index]

    def setParticleParameters(self, index: int, charge: float, sigma: float, epsilon: float):
        self._charges[index] = float(charge)
        self._sigmas[index] = float(sigma)
        self._epsilons[index] = float(epsilon)

    # -- cutoff / PBC / tolerance (CoulForce.cpp:44-76) -----------------------

    def getCutoffDistance(self) -> float:
        return self._cutoff

    def setCutoffDistance(self, cutoff: float):
        self._cutoff = float(cutoff)

    def usesPeriodicBoundaryConditions(self) -> bool:
        return self._pbc

    def setUsesPeriodicBoundaryConditions(self, if_period: bool):
        self._pbc = bool(if_period)

    def setEwaldErrorTolerance(self, tol: float):
        self._ewald_tol = float(tol)

    def getEwaldErrorTolerance(self) -> float:
        return self._ewald_tol

    def setUseDispersionCorrection(self, use: bool):
        """Opt into the isotropic long-range LJ tail correction E += C/V.

        Extension beyond the reference (which truncates LJ with no
        correction); the OpenMM NonbondedForce API analog.  Requires PBC.
        """
        self._use_dispersion = bool(use)

    def getUseDispersionCorrection(self) -> bool:
        return self._use_dispersion

    # -- exclusions (CoulForce.cpp:56-76) -------------------------------------

    def addException(self, p1: int, p2: int):
        self._check_particle(p1)
        self._check_particle(p2)
        if p1 == p2:
            raise ValueError("exclusion pair must be two distinct particles")
        self._exclusions.append((p1, p2))

    def getNumExceptions(self) -> int:
        return len(self._exclusions)

    def getExceptionParameters(self, index: int):
        return self._exclusions[index]

    # -- flux terms (CoulForce.cpp:78-140) ------------------------------------

    def addFluxBond(self, p1: int, p2: int, k: float, b: float):
        self._check_particle(p1)
        self._check_particle(p2)
        self._bonds.append((p1, p2, float(k), float(b)))

    def getNumFluxBonds(self) -> int:
        return len(self._bonds)

    def getFluxBondParameters(self, index: int):
        return self._bonds[index]

    def addFluxAngle(self, p1: int, p2: int, p3: int, k: float, theta: float):
        for p in (p1, p2, p3):
            self._check_particle(p)
        self._angles.append((p1, p2, p3, float(k), float(theta)))

    def getNumFluxAngles(self) -> int:
        return len(self._angles)

    def getFluxAngleParameters(self, index: int):
        return self._angles[index]

    def addFluxWater(self, po: int, ph1: int, ph2: int, k1: float, k2: float,
                     kub: float, b0: float, ub0: float):
        for p in (po, ph1, ph2):
            self._check_particle(p)
        self._waters.append((po, ph1, ph2, float(k1), float(k2), float(kub),
                             float(b0), float(ub0)))

    def getNumFluxWaters(self) -> int:
        return len(self._waters)

    def getFluxWaterParameters(self, index: int):
        return self._waters[index]

    # -- SWIG helpers (openmmcoul.i:67-75) -------------------------------------

    @staticmethod
    def cast(force) -> "CoulForce":
        if not isinstance(force, CoulForce):
            raise TypeError("force is not a CoulForce")
        return force

    @staticmethod
    def isinstance(force) -> bool:
        return isinstance(force, CoulForce)

    # -- compilation to pytree -------------------------------------------------

    def create_system(
        self,
        box=None,
        dtype=jnp.float32,
        direct_method: str = "auto",
        cell_capacity: Optional[int] = None,
        recip_method: str = "auto",
        skin_frac: float = 0.05,
        walk_layout: str = "auto",
        halo_devices: Optional[int] = None,
        cell_grid=None,
        pme_grid=None,
    ) -> ChargeFluxSystem:
        """Compile the builder into an immutable pytree system.

        This is the analog of kernel ``initialize`` in the reference
        (ReferenceCoulKernels.cpp:230-422): Ewald alpha/kmax are derived here,
        at trace time, from (cutoff, tolerance, box).

        Args:
          box: orthorhombic box edge lengths [3] in nm, or a [3, 3]
            reduced lower-triangular lattice matrix (triclinic); required
            iff PBC.
          dtype: float dtype for parameter arrays.
          direct_method: "dense", "cell", or "auto" (cell list for large
            periodic systems when the box admits >=3 cells per axis).
          cell_capacity: override the per-cell atom capacity.  The
            default gives ~4-sigma Poisson headroom over the *initial*
            density, counting atoms as independent; molecules move as
            units, so hot or unequilibrated runs can overflow it (the
            energy NaN-poisons — visibly, never silently).  Triage with
            utils.diagnose_nan, which suggests a capacity.
          halo_devices: size the (x, y) cell axes so they factor over
            this device count (rounding DOWN — wider cells keep cutoff
            coverage; pure x-slabs preferred, 2-D x-by-y bricks when the
            count exceeds or doesn't divide gx) so the ppermute
            halo-sharded route (parallel/halo.py) applies even when the
            natural grid doesn't divide the mesh.
          cell_grid: override the derived cell grid [3] (expert knob, like
            cell_capacity).  Each axis may only be REDUCED from the
            derived count (wider cells keep cutoff coverage); raising one
            would shrink cells below the cutoff and silently miss pairs,
            so it raises.  Main use: snapping gz to a multiple of 8 — gz
            sits on the TPU sublane dim of every block/slab array, and
            gz=9/10 grids measured a ~2x in-context direct-walk padding
            cliff (tools/cutoff_scan.py round 3).
          pme_grid: override the derived PME mesh [3] (expert knob — the
            analog of the reference framework's explicit PME-parameter
            setter).  Each axis may only be RAISED from the derived size
            (a finer mesh only improves accuracy; a coarser one would
            silently break the tolerance contract, so it raises).  Main
            use: picking a mesh divisible by the cell grid so the
            cell-blocked spread's per-cell patch windows stay tight
            (a 12-cell axis over an 80-point mesh measured recip
            2.40 -> 8.31 ms at 100k, BASELINE.md).
        """
        n = len(self._charges)
        if n == 0:
            raise ValueError("system has no particles")
        pme_grid_override = pme_grid
        if direct_method not in ("auto", "dense", "cell"):
            raise ValueError(
                f"unknown direct_method {direct_method!r}: expected 'auto', "
                f"'dense' or 'cell' ('cell_pallas' was removed — the XLA "
                f"roll walk measurably beats the hand kernels, BASELINE.md)")
        if recip_method not in ("auto", "xla", "pallas", "pme"):
            raise ValueError(
                f"unknown recip_method {recip_method!r}: expected 'auto', "
                f"'xla', 'pallas' or 'pme'")
        if walk_layout not in ("auto", "shift", "concat"):
            raise ValueError(
                f"unknown walk_layout {walk_layout!r}: expected 'auto', "
                f"'shift' or 'concat' ('ifull', 'concat_mxu' and "
                f"'concat_hyb' were measured slower and removed, "
                f"BASELINE.md)")
        if walk_layout == "auto":
            walk_layout = "concat"
        if self._use_dispersion and not self._pbc:
            raise ValueError(
                "the dispersion tail correction needs a periodic box "
                "(E_tail = C/V); disable it or enable PBC")
        triclinic = False
        if self._pbc:
            if box is None:
                raise ValueError("PBC system requires a box")
            box_arr = np.asarray(box, dtype=np.float64)
            if box_arr.size == 9:
                box_arr = box_arr.reshape(3, 3)
                if np.all(box_arr == np.diag(np.diag(box_arr))):
                    # a diagonal lattice matrix IS orthorhombic — collapse
                    # so every fast path (cell walk, halo, PME cell) applies
                    box_arr = np.diag(box_arr).copy()
                else:
                    triclinic = True
                    _validate_reduced_box(box_arr)
            else:
                box_arr = box_arr.reshape(3)
            # Ewald accuracy is set by the *perpendicular* widths (plane
            # spacings); for an orthorhombic box these are the edge lengths.
            widths = box_widths(box_arr)
            if triclinic and self._cutoff > min(widths) / 2:
                raise ValueError(
                    f"cutoff {self._cutoff} exceeds half the smallest "
                    f"perpendicular box width {min(widths) / 2:.4g}; the "
                    f"reduced-form minimum image is only exact below it")
            alpha = ewald_alpha(self._cutoff, self._ewald_tol)
            kmax = ewald_kmax(tuple(widths), alpha, self._ewald_tol)
            from .pme import DEFAULT_ORDER, pme_grid_size
            pme_order = DEFAULT_ORDER
            pme_grid = pme_grid_size(widths, alpha, self._ewald_tol,
                                     pme_order)
            if pme_grid_override is not None:
                if recip_method in ("xla", "pallas"):
                    raise ValueError(
                        f"pme_grid applies only to the PME reciprocal "
                        f"route; recip_method={recip_method!r} is a "
                        f"kmax-Ewald route that ignores the mesh")
                req = tuple(int(v) for v in pme_grid_override)
                if len(req) != 3 or any(
                        r < d for r, d in zip(req, pme_grid)):
                    raise ValueError(
                        f"pme_grid {req} must be a [3] mesh with every "
                        f"axis >= the tolerance-derived {pme_grid} (a "
                        f"coarser mesh would break the ewald_tol "
                        f"accuracy contract)")
                pme_grid = req
        else:
            if pme_grid_override is not None:
                raise ValueError("pme_grid applies only to periodic "
                                 "systems (no reciprocal space without "
                                 "PBC)")
            box_arr = np.zeros(3, dtype=np.float64)
            alpha = None
            kmax = None
            pme_grid = None
            pme_order = 6

        # Direct-space method selection (trace-time static).
        grid = None
        capacity = None
        method = direct_method
        if not self._pbc:
            method = "dense"
        else:
            # Reserve skin_frac*cutoff of Verlet skin when sizing cells:
            # slightly larger cells (more pair candidates) buy reusable
            # binning across ~skin/(2*v*dt) MD steps (neighbors.py).  A grid
            # sized exactly to the cutoff leaves zero skin and forces a
            # rebuild (and its gather/sort cost) every step.  Cells divide
            # the lattice fractionally, so the coverage bound is on the
            # *perpendicular plane spacing* per cell (width/ncells >= eff)
            # — for an orthorhombic box that is the edge length.
            eff = self._cutoff * (1.0 + skin_frac)
            ncells = tuple(int(np.floor(w / eff)) for w in widths)
            if halo_devices is not None and halo_devices > 1:
                # Halo sharding (parallel/halo.py) decomposes the (x, y)
                # cell axes over Dx*Dy = ndev device bricks and needs
                # gx % Dx == 0 and gy % Dy == 0.  Pick the factorization
                # that keeps the MOST cells after rounding each axis DOWN
                # to its multiple (wider cells keep cutoff coverage;
                # rounding up would shrink cells below it), preferring
                # pure x-slabs (one ppermute/eval vs three) on ties.  A
                # naturally dividing grid is left untouched.
                best = None
                for ddx in range(min(halo_devices, ncells[0]), 0, -1):
                    if halo_devices % ddx:
                        continue
                    ddy = halo_devices // ddx
                    gxh = (ncells[0] // ddx) * ddx
                    gyh = (ncells[1] // ddy) * ddy
                    if gxh < max(3, ddx) or gyh < max(3, ddy):
                        continue
                    key = (gxh * gyh, ddy == 1)
                    if best is None or key > best[0]:
                        best = (key, (gxh, gyh))
                if best is None:
                    raise ValueError(
                        f"halo_devices={halo_devices}: the box fits only "
                        f"{ncells[0]}x{ncells[1]} x/y cells at cutoff "
                        f"{self._cutoff} — no >=3-cell grid factors over "
                        f"the device count")
                ncells = best[1] + ncells[2:]
            cell_ok = all(c >= 3 for c in ncells)
            if method == "auto":
                # an explicit halo_devices request means the caller will
                # run the halo route — force the cell method it requires
                # rather than silently dropping the sizing on small N
                if halo_devices is not None and halo_devices > 1:
                    method = "cell"
                else:
                    method = "cell" if (cell_ok and n > 2048) else "dense"
            elif method == "dense" and halo_devices is not None \
                    and halo_devices > 1:
                raise ValueError(
                    "halo_devices requires the cell route "
                    "(direct_method='cell' or 'auto'); the dense route "
                    "has no cell grid to size")
            if method == "cell":
                if not cell_ok:
                    raise ValueError(
                        f"box (plane widths {tuple(widths)}) too small for "
                        f"a cell list at cutoff {self._cutoff} (need >=3 "
                        f"cells per axis)")
                if cell_grid is not None:
                    req = tuple(int(g) for g in cell_grid)
                    if len(req) != 3 or any(g < 3 for g in req):
                        raise ValueError(
                            f"cell_grid override {req} needs 3 axes of "
                            f">=3 cells")
                    # hard coverage bound: width/ncells >= cutoff (zero
                    # skin).  Finer than the skin-reserved derived grid is
                    # allowed (an expert work-balance knob: thinner skin
                    # means more frequent rebuilds, guarded by the
                    # freshness poison) but never finer than the cutoff
                    # itself — that would silently miss pairs.
                    hard_max = tuple(int(np.floor(w / self._cutoff))
                                     for w in widths)
                    if any(r > d for r, d in zip(req, hard_max)):
                        raise ValueError(
                            f"cell_grid override {req} exceeds the "
                            f"zero-skin bound {hard_max}: cells would "
                            f"shrink below the cutoff and miss pairs")
                    if halo_devices is not None and halo_devices > 1 \
                            and req[0] % halo_devices:
                        raise ValueError(
                            f"cell_grid override x-axis {req[0]} not "
                            f"divisible by halo_devices={halo_devices}")
                    ncells = req
                grid = ncells
                if cell_capacity is None:
                    n_total_cells = ncells[0] * ncells[1] * ncells[2]
                    avg = n / n_total_cells
                    # ~4-sigma Poisson headroom for density fluctuations;
                    # padded to a multiple of 8 (f32 sublane).  Utilization is
                    # quadratic in capacity, so keep the margin tight; overflow
                    # is detectable via cells.validate_cell_list.
                    capacity = int(np.ceil(max(avg + 4 * math.sqrt(max(avg, 1.0)) + 4, 8.0)))
                    capacity = ((capacity + 7) // 8) * 8
                    # Snap UP to a lane-width multiple when close ([cap,
                    # cap] pair blocks then tile the 128-wide VPU exactly).
                    # Never snap DOWN: a 30k NVE run with the default
                    # capacity snapped 136 -> 128 (3.6 sigma) overflowed
                    # mid-trajectory and NaN-poisoned — 4-sigma headroom
                    # is the floor, not a target.
                    snapped = -(-capacity // 128) * 128
                    if snapped - capacity <= 16:
                        capacity = snapped
                else:
                    capacity = int(cell_capacity)

        # Chunk the concat/ifull walk so one pair tile stays under the
        # memory budget (lane width rounds S*cap up to the 128 lanes).
        walk_chunks = 1
        if method == "cell" and walk_layout.startswith("concat"):
            s_width = 14
            lane_w = -(-s_width * capacity // 128) * 128
            itemsize = jnp.dtype(dtype).itemsize
            tile_bytes = (grid[0] * grid[1] * grid[2] * capacity
                          * lane_w * itemsize)
            budget = 320 * 2 ** 20
            for d in range(1, grid[0] + 1):
                if grid[0] % d == 0 and tile_bytes // d <= budget:
                    walk_chunks = d
                    break
            else:
                walk_chunks = grid[0]

        if self._pbc and not triclinic and \
                self._cutoff > float(np.min(box_arr)) / 2 and \
                method == "dense":
            import warnings
            warnings.warn(
                f"cutoff {self._cutoff} exceeds min(box)/2 = "
                f"{float(np.min(box_arr)) / 2:.4g}; the dense min-image sum "
                f"counts only the nearest periodic image of each pair "
                f"(the reference relies on OpenMM to reject this case)",
                stacklevel=2)

        def arr(x, dt=dtype):
            return jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dt)

        def iarr(x, shape):
            a = np.asarray(x, dtype=np.int32)
            return jnp.asarray(a.reshape(shape))

        excl = sorted({(min(p), max(p)) for p in self._exclusions})
        bonds = self._bonds
        angles = self._angles
        waters = self._waters

        # Molecule-template detection (topology.py): repeated per-molecule
        # index blocks (solvent) are reordered molecule-major and recorded
        # as a TemplateSet so charges/exclusions take the gather/scatter-
        # free reshape path; rows that don't repeat (solute, crosslinks)
        # land at the tail and keep the general scatter path.  Order within
        # a term type is not observable (sums are permutation-invariant);
        # the builder keeps the user's order for the get*Parameters API.
        flux_template = None
        det = detect_templates({
            "bonds": np.asarray([[b[0], b[1]] for b in bonds],
                                dtype=np.int64).reshape(len(bonds), 2),
            "angles": np.asarray([[a[0], a[1], a[2]] for a in angles],
                                 dtype=np.int64).reshape(len(angles), 3),
            "waters": np.asarray([[w[0], w[1], w[2]] for w in waters],
                                 dtype=np.int64).reshape(len(waters), 3),
        }, n_atoms=n)
        if det is not None:
            flux_template, perms = det
            bonds = [bonds[i] for i in perms["bonds"]]
            angles = [angles[i] for i in perms["angles"]]
            waters = [waters[i] for i in perms["waters"]]

        excl_template = None
        det = detect_templates({
            "exclusions": np.asarray([list(e) for e in excl],
                                     dtype=np.int64).reshape(len(excl), 2),
        }, n_atoms=n)
        if det is not None:
            excl_template, perms = det
            excl = [excl[i] for i in perms["exclusions"]]

        tail_coeff = None
        if self._use_dispersion:
            tail_coeff = dispersion_tail_coefficient(
                self._sigmas, self._epsilons, self._cutoff)

        pme_slack = (0, 0, 0)
        if self._pbc and grid is not None and pme_grid is not None:
            skin = max(float(min(widths[a] / grid[a] for a in range(3)))
                       - self._cutoff, 0.0)
            pme_slack = tuple(
                int(math.ceil(0.5 * skin / (widths[a] / pme_grid[a])))
                for a in range(3))

        spec = StaticSpec(
            pbc=self._pbc,
            cutoff=self._cutoff,
            ewald_tol=self._ewald_tol,
            alpha=alpha,
            kmax=kmax,
            direct_method=method,
            cell_grid=grid,
            cell_capacity=capacity,
            walk_layout=walk_layout,
            walk_chunks=walk_chunks,
            recip_method=recip_method,
            pme_grid=pme_grid,
            pme_order=pme_order,
            pme_slack=pme_slack,
            tail_coeff=tail_coeff,
            flux_template=flux_template,
            excl_template=excl_template,
        )

        return ChargeFluxSystem(
            q0=arr(self._charges),
            sigma=arr(self._sigmas),
            epsilon=arr(self._epsilons),
            exclusions=iarr([list(e) for e in excl], (len(excl), 2)),
            bond_idx=iarr([[b[0], b[1]] for b in bonds], (len(bonds), 2)),
            bond_k=arr([b[2] for b in bonds]),
            bond_b=arr([b[3] for b in bonds]),
            angle_idx=iarr([[a[0], a[1], a[2]] for a in angles], (len(angles), 3)),
            angle_k=arr([a[3] for a in angles]),
            angle_theta0=arr([a[4] for a in angles]),
            water_idx=iarr([[w[0], w[1], w[2]] for w in waters], (len(waters), 3)),
            water_k1=arr([w[3] for w in waters]),
            water_k2=arr([w[4] for w in waters]),
            water_kub=arr([w[5] for w in waters]),
            water_b0=arr([w[6] for w in waters]),
            water_ub0=arr([w[7] for w in waters]),
            box=arr(box_arr),
            spec=spec,
        )

    # -- serialization ---------------------------------------------------------
    # The reference has no Force serialization at all (SURVEY §5: no
    # CoulForceProxy).  Here the scene spec round-trips through plain JSON.

    def to_dict(self) -> dict:
        return {
            "particles": [[q, s, e] for q, s, e in zip(
                self._charges, self._sigmas, self._epsilons)],
            "exclusions": [list(e) for e in self._exclusions],
            "flux_bonds": [list(b) for b in self._bonds],
            "flux_angles": [list(a) for a in self._angles],
            "flux_waters": [list(w) for w in self._waters],
            "cutoff": self._cutoff,
            "ewald_tolerance": self._ewald_tol,
            "pbc": self._pbc,
            "dispersion_correction": self._use_dispersion,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "CoulForce":
        force = cls()
        for q, s, e in d["particles"]:
            force.addParticle(q, s, e)
        for p1, p2 in d.get("exclusions", []):
            force.addException(p1, p2)
        for b in d.get("flux_bonds", []):
            force.addFluxBond(*b)
        for a in d.get("flux_angles", []):
            force.addFluxAngle(*a)
        for w in d.get("flux_waters", []):
            force.addFluxWater(*w)
        force.setCutoffDistance(d.get("cutoff", 1.0))
        force.setEwaldErrorTolerance(d.get("ewald_tolerance", 1e-4))
        force.setUsesPeriodicBoundaryConditions(d.get("pbc", False))
        force.setUseDispersionCorrection(d.get("dispersion_correction", False))
        return force

    # -- internals -------------------------------------------------------------

    def _check_particle(self, p: int):
        if not (0 <= p < len(self._charges)):
            raise IndexError(f"particle index {p} out of range [0, {len(self._charges)})")
