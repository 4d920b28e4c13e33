"""Molecule-template detection — the TPU answer to per-term scatter kernels.

The reference processes flux terms one CUDA thread per term with atomic
scatters (calcChargeFlux.cu:29-289).  On TPU, gather/scatter run at a few
elements per cycle (measured ~7-15 ns/element through XLA), so a 30k-atom
water box spends milliseconds on what is microseconds of arithmetic.

The observation: flux/exclusion *indices* are static, and in real MD systems
they almost always form a repeating per-molecule pattern — C copies of an
s-atom molecule occupying the contiguous atom range [offset, offset + C*s),
each copy carrying the same local term structure.  When that holds, every
term evaluation reshapes to [C, s, 3] with *static* per-slot slices: no
gathers, no scatters, and the autodiff backward is pad/slice — all fast on
TPU.  Parameters (k, b, theta0, ...) may differ per copy; only the index
structure must repeat.

Detection runs once at system build time in NumPy (the analog of the
reference baking NUM_FLUX_* into NVRTC macros, CudaCoulKernels.cpp:377-389);
systems that don't match simply fall back to the general scatter path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

# Bounds on what we unroll into the trace.  Each template row costs a
# handful of XLA ops and each molecule slot a static slice; these keep the
# jaxpr small while covering water models, small solutes and typical repeat
# units.  Larger molecules fall back to the general scatter path.
TEMPLATE_UNROLL_LIMIT = 128   # term rows per molecule
TEMPLATE_STRIDE_LIMIT = 64    # atoms per molecule


@dataclasses.dataclass(frozen=True)
class MoleculeTemplate:
    """Hashable description of a repeating molecular block.

    ``count`` copies of an ``stride``-atom molecule occupy atoms
    [offset, offset + count*stride).  Each ``rows[kind]`` entry is the local
    (0-based, < stride) index tuple of one term of that kind, in the order
    the corresponding system arrays are stored (molecule-major).
    """

    offset: int
    stride: int
    count: int
    # kind name -> tuple of local index tuples (one per term in molecule 0)
    rows: Tuple[Tuple[str, Tuple[Tuple[int, ...], ...]], ...]

    def local_rows(self, kind: str) -> Tuple[Tuple[int, ...], ...]:
        for k, v in self.rows:
            if k == kind:
                return v
        return ()

    @property
    def n_rows(self) -> int:
        return sum(len(v) for _, v in self.rows)


def _component_stride(nonempty, off, top):
    """Infer (stride, count) from the connected components of the term graph.

    Atoms referenced by the same row are one component ("molecule");
    components must start at evenly spaced offsets.  Label propagation with
    pointer jumping on the compressed referenced-atom set — pure NumPy, runs
    once at build time.
    """
    ref = np.unique(np.concatenate([v.reshape(-1) for v in nonempty.values()]))
    labels = np.arange(len(ref), dtype=np.int64)
    # hub edges: (row_min, member) for every row member
    hubs = []
    members = []
    for v in nonempty.values():
        c = np.searchsorted(ref, v)       # [T, w] compressed
        hub = c.min(axis=1)
        hubs.append(np.repeat(hub, v.shape[1]))
        members.append(c.reshape(-1))
    hub = np.concatenate(hubs)
    mem = np.concatenate(members)
    for _ in range(64):
        pair_min = np.minimum(labels[hub], labels[mem])
        new = labels.copy()
        np.minimum.at(new, hub, pair_min)
        np.minimum.at(new, mem, pair_min)
        new = new[new]                    # pointer jumping
        if np.array_equal(new, labels):
            break
        labels = new
    else:
        return None
    roots, mol_of = np.unique(labels, return_inverse=True)
    # component minima in atom-id space, sorted
    comp_min = np.full(len(roots), np.iinfo(np.int64).max)
    np.minimum.at(comp_min, mol_of, ref)
    comp_min.sort()
    count = len(comp_min)
    if count == 1:
        stride = top - off
    else:
        gaps = np.diff(comp_min)
        if not np.all(gaps == gaps[0]):
            return None
        stride = int(gaps[0])
    return stride, count


def detect_template(kinds: Dict[str, np.ndarray],
                    n_atoms: Optional[int] = None):
    """Detect a repeating molecule structure across index arrays.

    Args:
      kinds: kind name -> int index array [T_kind, width]; empty arrays are
        allowed (and recorded with zero template rows).
      n_atoms: total atom count; when given, declines templates whose block
        [offset, offset + count*stride) would run past the atom array.

    Returns:
      (template, perms) where ``perms[kind]`` reorders that kind's rows into
      molecule-major canonical order, or None if the structure doesn't
      repeat (or exceeds TEMPLATE_UNROLL_LIMIT rows per molecule).
    """
    nonempty = {k: np.asarray(v, dtype=np.int64)
                for k, v in kinds.items() if np.size(v)}
    if not nonempty:
        return None

    allidx = np.concatenate([v.reshape(-1) for v in nonempty.values()])
    off = int(allidx.min())
    top = int(allidx.max()) + 1

    sc = _component_stride(nonempty, off, top)
    if sc is None:
        return None
    stride, count = sc
    if stride <= 0 or stride > TEMPLATE_STRIDE_LIMIT:
        return None
    if top > off + count * stride:
        return None
    if n_atoms is not None and off + count * stride > n_atoms:
        return None

    rows = []
    perms: Dict[str, np.ndarray] = {}
    n_rows = 0
    for kind, idx in kinds.items():
        idx = np.asarray(idx, dtype=np.int64)
        if idx.size == 0:
            rows.append((kind, ()))
            perms[kind] = np.zeros(0, dtype=np.int64)
            continue
        rel = idx - off
        mol = rel[:, 0] // stride
        # every index of a row must fall in that row's molecule block
        if not np.all(rel // stride == mol[:, None]):
            return None
        local = rel - mol[:, None] * stride
        # canonical order: molecule-major, rows tie-broken by local columns
        # (np.lexsort sorts by the LAST key first)
        w = local.shape[1]
        perm = np.lexsort(tuple(local[:, c] for c in range(w - 1, -1, -1))
                          + (mol,))
        mol_s = mol[perm]
        local_s = local[perm]
        t = idx.shape[0]
        if t % count != 0:
            return None
        m_rows = t // count
        if not np.all(mol_s == np.repeat(np.arange(count), m_rows)):
            return None
        template = local_s[:m_rows]
        if not np.array_equal(local_s.reshape(count, m_rows, -1),
                              np.broadcast_to(template, (count, m_rows, template.shape[1]))):
            return None
        rows.append((kind, tuple(tuple(int(x) for x in r) for r in template)))
        perms[kind] = perm
        n_rows += m_rows

    if n_rows > TEMPLATE_UNROLL_LIMIT:
        return None

    tpl = MoleculeTemplate(offset=off, stride=stride, count=count,
                           rows=tuple(rows))
    return tpl, perms
