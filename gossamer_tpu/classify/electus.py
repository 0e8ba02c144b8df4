"""Electus: generalized read filtering against N reference k-mer sets.

Engine parity with ``src/ElectApp.cc:78-805``: each reference contributes
a bit in a per-k-mer mask; a read matches when the popcount of the OR of
its k-mers' masks reaches ``ref-threshold``.  (The reference's paired
loop compares the raw mask instead of its popcount for the second mate —
``ElectApp.cc:448``; we apply the documented popcount semantics to both.)
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

from ..core import kmer as K
from ..graph.kmer_set import KmerSet
from ..io.readers import Read
from .annotated_set import _as_sorted_unique

SEP = np.uint8(255)


class RefMaskSet:
    """Union k-mer set + per-k-mer reference bitmask (up to 64 refs)."""

    def __init__(self, union: KmerSet, mask: np.ndarray, n_refs: int):
        self.union = union
        self.mask = mask
        self.n_refs = n_refs

    @classmethod
    def build(cls, sets: list[KmerSet]) -> "RefMaskSet":
        if len(sets) > 64:
            raise ValueError("electus supports at most 64 reference sets")
        k = sets[0].k
        lo = np.concatenate([s.lo for s in sets])
        hi = np.concatenate([s.hi for s in sets])
        lo, hi = _as_sorted_unique(lo, hi)
        union = KmerSet(k, lo, hi)
        mask = np.zeros(len(lo), dtype=np.uint64)
        for i, s in enumerate(sets):
            hit, _ = s.access_and_rank(lo, hi)
            mask |= np.where(hit, np.uint64(1 << i), np.uint64(0))
        return cls(union, mask, len(sets))


def read_masks(codes_list: list[np.ndarray], refs: RefMaskSet) -> np.ndarray:
    """OR of reference masks over each read's k-mers (vectorized batch)."""
    k = refs.union.k
    n = len(codes_list)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    parts = []
    for c in codes_list:
        parts.append(c)
        parts.append(np.array([SEP], dtype=np.uint8))
    flat = np.concatenate(parts)
    if len(flat) < k:
        return out
    read_id = np.cumsum(flat == SEP)
    n_win = len(flat) - k + 1
    win_read = read_id[:n_win]
    lo = np.zeros(n_win, dtype=np.uint64)
    hi = np.zeros(n_win, dtype=np.uint64)
    valid = np.ones(n_win, dtype=bool)
    for j in range(k):
        b = flat[j : j + n_win]
        valid &= b < 4
        hi = (hi << np.uint64(2)) | (lo >> np.uint64(62))
        lo = (lo << np.uint64(2)) | (b.astype(np.uint64) & np.uint64(3))
    lo, hi, win_read = lo[valid], hi[valid], win_read[valid]
    nlo, nhi, _ = K.normalize(lo, hi, k)
    hit, r = refs.union.access_and_rank(nlo, nhi)
    r = r[hit]
    win_read = win_read[hit]
    np.bitwise_or.at(out, win_read, refs.mask[r])
    return out


def read_masks_device(codes_list: list[np.ndarray],
                      refs: RefMaskSet) -> np.ndarray:
    """Device sort-join formulation of :func:`read_masks`.

    The xenome classify kernel resolves TWO annotated classes per pass
    (``classify/device.py``: E = key<<2 | lhs<<1|rhs), so N reference
    sets run in ceil(N/2) passes: pass p annotates the union of refs
    (2p, 2p+1) with (lhs, rhs) membership bits and the per-read blrg
    one-hot bits map back to per-ref hits.  Replaces the host
    searchsorted join (gather-bound ~5.6K reads/s family) with the
    sort+scan engine (~370K reads/s measured for xenome).
    """
    import jax.numpy as jnp

    from .device import classify_codes_device, encode_set

    k = refs.union.k
    n = len(codes_list)
    out = np.zeros(n, dtype=np.uint64)
    mask = refs.mask
    lo = refs.union.lo
    for p in range(0, refs.n_refs, 2):
        bit_a = np.uint64(1 << p)
        in_a = (mask & bit_a) != 0
        if p + 1 < refs.n_refs:
            bit_b = np.uint64(1 << (p + 1))
            in_b = (mask & bit_b) != 0
        else:
            bit_b = np.uint64(0)
            in_b = np.zeros_like(in_a)
        sel = in_a | in_b
        set_E = jnp.asarray(encode_set(lo[sel], in_a[sel], in_b[sel]))
        blrg = classify_codes_device(codes_list, set_E, k)
        # cls = lhs<<1|rhs: A-hit -> cls 2 or 3; B-hit -> cls 1 or 3
        hit_a = (blrg & 0b1100) != 0
        hit_b = (blrg & 0b1010) != 0
        out |= np.where(hit_a, bit_a, np.uint64(0))
        out |= np.where(hit_b, bit_b, np.uint64(0))
    return out


def popcount64(x: np.ndarray) -> np.ndarray:
    return np.bitwise_count(x) if hasattr(np, "bitwise_count") else np.array(
        [bin(int(v)).count("1") for v in x]
    )


def filter_reads(
    reads: Iterable[Read], refs: RefMaskSet, threshold: int, batch: int = 4096
) -> Iterator[tuple[Read, bool]]:
    buf: list[Read] = []
    for rd in reads:
        buf.append(rd)
        if len(buf) >= batch:
            yield from _flush(buf, refs, threshold)
            buf = []
    if buf:
        yield from _flush(buf, refs, threshold)


def _read_masks_auto(codes, refs):
    # device sort-join engine for narrow keys; host searchsorted beyond
    if refs.union.k <= 30:
        return read_masks_device(codes, refs)
    return read_masks(codes, refs)


def _flush(buf, refs, threshold):
    masks = _read_masks_auto([K.encode_bases(r.seq) for r in buf], refs)
    match = popcount64(masks) >= threshold
    for rd, m in zip(buf, match):
        yield rd, bool(m)


def filter_pairs(
    pairs: Iterable[tuple[Read, Read]], refs: RefMaskSet, threshold: int,
    batch: int = 4096,
) -> Iterator[tuple[Read, Read, bool]]:
    buf: list[tuple[Read, Read]] = []
    for pr in pairs:
        buf.append(pr)
        if len(buf) >= batch:
            yield from _flush_pairs(buf, refs, threshold)
            buf = []
    if buf:
        yield from _flush_pairs(buf, refs, threshold)


def _flush_pairs(buf, refs, threshold):
    masks = _read_masks_auto(
        [K.encode_bases(r.seq) for pr in buf for r in pr], refs
    )
    for i, (a, b) in enumerate(buf):
        m = masks[2 * i] | masks[2 * i + 1]
        yield a, b, bool(popcount64(np.array([m]))[0] >= threshold)
