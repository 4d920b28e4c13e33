"""Minimal trajectory output: XYZ frames (VMD/OVITO-readable).

The reference plugin inherits reporting from OpenMM (SURVEY §1 L0 — DCD /
state-data reporters live in the host framework); a standalone engine
needs at least a lowest-common-denominator visualizable format.  XYZ is
deliberately chosen over DCD: zero dependencies, human-readable, and every
viewer ingests it.  Coordinates convert nm -> Angstrom on write (the XYZ
convention).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np

# mass (amu) -> element, for the species this engine's models produce;
# nearest-match lookup so slightly customized masses still resolve
_MASS_TABLE = (
    (1.008, "H"), (12.011, "C"), (14.007, "N"), (15.999, "O"),
    (22.99, "Na"), (35.45, "Cl"),
)


def symbols_from_masses(masses: Sequence[float]) -> list:
    """Best-effort element symbols by nearest tabulated mass (> 20%
    mismatch falls back to 'X'); pass explicit symbols to write_xyz when
    the system has species outside the table."""
    out = []
    for m in np.asarray(masses, dtype=np.float64):
        best, sym = None, "X"
        for ref, s in _MASS_TABLE:
            d = abs(m - ref)
            if best is None or d < best:
                best, sym = d, s
        out.append(sym if best <= 0.2 * m else "X")
    return out


def write_xyz(path: str, frames, symbols: Optional[Sequence[str]] = None,
              masses: Optional[Sequence[float]] = None,
              comments: Optional[Iterable[str]] = None,
              append: bool = False) -> int:
    """Write one or many frames of [N, 3] nm coordinates as XYZ (Angstrom).

    ``frames``: a single [N, 3] array or an iterable / [F, N, 3] stack.
    Element symbols come from ``symbols``, else ``masses`` (nearest-match),
    else every atom is 'X'.  Returns the number of frames written.
    """
    frames = np.asarray(frames, dtype=np.float64)
    if frames.ndim == 2:
        frames = frames[None]
    if frames.ndim != 3 or frames.shape[-1] != 3:
        raise ValueError(f"expected [N,3] or [F,N,3] frames, got "
                         f"{frames.shape}")
    n = frames.shape[1]
    if symbols is None:
        symbols = (symbols_from_masses(masses) if masses is not None
                   else ["X"] * n)
    if len(symbols) != n:
        raise ValueError(f"{len(symbols)} symbols for {n} atoms")
    if comments is None:
        comments = [f"frame {i}" for i in range(frames.shape[0])]
    else:
        comments = list(comments)
        if len(comments) != frames.shape[0]:
            raise ValueError(f"{len(comments)} comments for "
                             f"{frames.shape[0]} frames")
    with open(path, "a" if append else "w") as fh:
        for frame, comment in zip(frames, comments):
            fh.write(f"{n}\n{comment}\n")
            ang = frame * 10.0                       # nm -> Angstrom
            for s, (px, py, pz) in zip(symbols, ang):
                fh.write(f"{s} {px:.6f} {py:.6f} {pz:.6f}\n")
    return frames.shape[0]


def read_xyz(path: str):
    """Read an XYZ file back: (frames [F, N, 3] nm, symbols, comments).
    Round-trip counterpart of write_xyz (for tests and quick analysis)."""
    frames, comments, symbols = [], [], None
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        n = int(lines[i])
        comments.append(lines[i + 1])
        rows, syms = [], []
        for ln in lines[i + 2:i + 2 + n]:
            parts = ln.split()
            syms.append(parts[0])
            rows.append([float(v) for v in parts[1:4]])
        if symbols is None:
            symbols = syms
        frames.append(rows)
        i += 2 + n
    return np.asarray(frames, np.float64) / 10.0, symbols, comments
