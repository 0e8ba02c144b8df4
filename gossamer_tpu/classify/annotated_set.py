"""Annotated k-mer sets: union set + per-source membership bits.

The xenome index structure (``src/GossCmdMergeAndAnnotateKmerSets.cc:120-205``):
a union KmerSet plus two bit vectors ``.lhs-bits`` / ``.rhs-bits`` marking
which source(s) each k-mer came from, refined by ``compute-near-kmers``
(``src/GossCmdComputeNearKmers.cc:58-147``) which clears both bits on
"marginal" k-mers that have a near-neighbor in the opposite class.
"""

from __future__ import annotations

import numpy as np

from ..core import kmer as K
from ..graph.kmer_set import KmerSet, rank128
from ..io.artifacts import read_array, write_array
from ..io.factory import FileFactory

U64 = np.uint64


class AnnotatedKmerSet:
    def __init__(self, kset: KmerSet, lhs_bits: np.ndarray, rhs_bits: np.ndarray):
        self.kset = kset
        self.lhs = lhs_bits.astype(bool)
        self.rhs = rhs_bits.astype(bool)

    # -- persistence -------------------------------------------------------
    def write(self, basename: str, fac: FileFactory) -> None:
        self.kset.write(basename, fac)
        write_array(fac, basename + ".lhs-bits", self.lhs)
        write_array(fac, basename + ".rhs-bits", self.rhs)

    @classmethod
    def read(cls, basename: str, fac: FileFactory) -> "AnnotatedKmerSet":
        ks = KmerSet.read(basename, fac)
        return cls(
            ks,
            read_array(fac, basename + ".lhs-bits"),
            read_array(fac, basename + ".rhs-bits"),
        )


def merge_and_annotate(lhs: KmerSet, rhs: KmerSet) -> tuple[AnnotatedKmerSet, int]:
    """Union of two sorted canonical sets + membership bits.

    Returns (annotated set, number of common k-mers); the reference's
    2-cursor merge becomes a sorted union + two membership queries.
    """
    assert lhs.k == rhs.k, "cannot merge k-mer sets with different K"
    lo = np.concatenate([lhs.lo, rhs.lo])
    hi = np.concatenate([lhs.hi, rhs.hi])
    order = np.lexsort((lo, hi))
    lo, hi = lo[order], hi[order]
    if len(lo):
        keep = np.ones(len(lo), dtype=bool)
        keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        lo, hi = lo[keep], hi[keep]
    union = KmerSet(lhs.k, lo, hi)
    lhs_bits, _ = lhs.access_and_rank(lo, hi) if lhs.count else (np.zeros(len(lo), bool), None)
    rhs_bits, _ = rhs.access_and_rank(lo, hi) if rhs.count else (np.zeros(len(lo), bool), None)
    common = int((lhs_bits & rhs_bits).sum())
    return AnnotatedKmerSet(union, lhs_bits, rhs_bits), common


def compute_near_kmers(ann: AnnotatedKmerSet, batch: int = 1 << 16) -> int:
    """Clear both bits on marginal k-mers.

    Literal reimplementation of ``GossCmdComputeNearKmers.cc:70-110``: for
    each exclusive k-mer x, the probed neighbors are x ^ (b << j) for
    b in 1..3 and *bit* offset j in 0..K-1 (the reference shifts by j,
    not 2j, so only the low K bits are mutated — we reproduce that
    behavior exactly for classification parity).  x is marginal iff some
    normalized neighbor is present, exclusive, and of the opposite class.
    Returns the number of marginal ("gray") k-mers.
    """
    ks = ann.kset
    k = ks.k
    excl = np.nonzero(ann.lhs != ann.rhs)[0]
    gray_total = 0
    new_lhs = ann.lhs.copy()
    new_rhs = ann.rhs.copy()
    masks = []
    for j in range(k):
        for b in (1, 2, 3):
            masks.append(b << j)
    masks = np.array(masks, dtype=object)

    for s in range(0, len(excl), batch):
        idx = excl[s : s + batch]
        xlo = ks.lo[idx]
        xhi = ks.hi[idx]
        x_lhs = ann.lhs[idx]
        found = np.zeros(len(idx), dtype=bool)
        for m in masks:
            mlo = U64(int(m) & ((1 << 64) - 1))
            mhi = U64(int(m) >> 64)
            ylo = xlo ^ mlo
            yhi = xhi ^ mhi
            changed = (ylo != xlo) | (yhi != xhi)
            nlo, nhi, _ = K.normalize(ylo, yhi, k)
            hit, r = ks.access_and_rank(nlo, nhi)
            safe_r = np.minimum(r, max(ks.count - 1, 0))
            r_excl = ann.lhs[safe_r] != ann.rhs[safe_r]
            opp = ann.lhs[safe_r] != x_lhs
            found |= changed & hit & r_excl & opp
        gray_total += int(found.sum())
        new_lhs[idx[found]] = False
        new_rhs[idx[found]] = False
    ann.lhs = new_lhs
    ann.rhs = new_rhs
    return gray_total


# ---------------------------------------------------------------- set ops
def _as_sorted_unique(lo, hi):
    order = np.lexsort((lo, hi))
    lo, hi = lo[order], hi[order]
    if len(lo):
        keep = np.ones(len(lo), dtype=bool)
        keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        lo, hi = lo[keep], hi[keep]
    return lo, hi


def merge_sets(sets: list[KmerSet]) -> KmerSet:
    """Union of N sets (``goss merge-kmer-sets``)."""
    k = sets[0].k
    lo = np.concatenate([s.lo for s in sets])
    hi = np.concatenate([s.hi for s in sets])
    lo, hi = _as_sorted_unique(lo, hi)
    return KmerSet(k, lo, hi)


def intersect_sets(a: KmerSet, b: KmerSet) -> KmerSet:
    hit, _ = b.access_and_rank(a.lo, a.hi)
    return KmerSet(a.k, a.lo[hit], a.hi[hit])


def subtract_sets(a: KmerSet, b: KmerSet) -> KmerSet:
    hit, _ = b.access_and_rank(a.lo, a.hi)
    return KmerSet(a.k, a.lo[~hit], a.hi[~hit])
