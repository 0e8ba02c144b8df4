"""Sorting / dedup / merge primitives over 128-bit k-mer lanes.

This is the TPU replacement for the reference's counting engines
(``src/BackyardHash.cc`` concurrent hash + ``src/BlendedSort.hh`` radix
sort + ``src/AsyncMerge.tcc`` external merge, SURVEY.md §2.4): sort big
static-shape batches with XLA's sort (keys decomposed into uint32 limbs),
then dedup equal keys with a segment-sum, then merge sorted runs by
concat+sort.  Equal keys always *sum their counts*, matching
``AsyncMerge.tcc:190-211``.

Invalid/padding lanes use the all-ones sentinel (> any valid 126-bit
rho-mer) so they sort to the tail and merge away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U64 = jnp.uint64

SENTINEL = 0xFFFFFFFFFFFFFFFF  # lo == hi == all ones


def limbs32(x):
    """uint64 -> (hi32, lo32) uint32 sort keys."""
    return (x >> 32).astype(jnp.uint32), x.astype(jnp.uint32)


def sort_by_kmer(lo, hi, *payloads):
    """Sort lanes ascending by 128-bit (hi, lo) value; payloads follow."""
    h1, h0 = limbs32(hi)
    l1, l0 = limbs32(lo)
    ops = (h1, h0, l1, l0) + tuple(payloads)
    out = jax.lax.sort(ops, num_keys=4)
    h = out[0].astype(U64) << 32 | out[1].astype(U64)
    lo2 = out[2].astype(U64) << 32 | out[3].astype(U64)
    return (lo2, h) + tuple(out[4:])


def mask_to_sentinel(lo, hi, valid):
    s = U64(SENTINEL)
    return jnp.where(valid, lo, s), jnp.where(valid, hi, s)


def _group_sums_sorted(is_new, counts):
    """Per-lane group totals of a sorted grouping, no gathers/scatters.

    Returns (group_sum_at_last_lane, is_last, seg): ``group_sum`` is valid
    on lanes where ``is_last``; uses cumsum + a cummax forward-fill of the
    prefix value at each group start (counts >= 0 makes the prefix sum
    nondecreasing, so cummax(carry) == most recent carry).
    """
    n = is_new.shape[0]
    S = jnp.cumsum(counts.astype(jnp.int64))  # wide scan; no wraparound
    prevS = jnp.concatenate([jnp.zeros((1,), S.dtype), S[:-1]])
    base = jax.lax.cummax(jnp.where(is_new, prevS, 0))
    group_sum = (S - base).astype(counts.dtype)
    is_last = jnp.ones((n,), dtype=bool)
    if n > 1:
        is_last = is_last.at[:-1].set(is_new[1:])
    seg = jnp.cumsum(is_new.astype(jnp.int64)) - 1
    return group_sum, is_last, seg


def dedup_sorted(lo, hi, counts):
    """Collapse equal adjacent keys, summing counts.

    Returns (lo, hi, counts, n_unique) of the same static length; entries
    at index >= n_unique are sentinel with count 0.  Sentinel lanes in the
    input (invalid windows / padding) are excluded from n_unique but
    collapse into one trailing sentinel group.

    TPU note: scatters/gathers with data-dependent indices are orders of
    magnitude slower than sorting, so group sums come from cumsum+cummax
    (no gathers) and compaction is one extra key sort that moves each
    group's last lane to position seg.
    """
    n = lo.shape[0]
    is_new = jnp.ones((n,), dtype=bool)
    if n > 1:
        same = (lo[1:] == lo[:-1]) & (hi[1:] == hi[:-1])
        is_new = is_new.at[1:].set(~same)
    group_sum, is_last, seg = _group_sums_sorted(is_new, counts)
    # compaction: representatives (last lanes) keyed by seg, others pushed
    # to the tail; one sort does the permutation
    key = jnp.where(is_last, seg, jnp.int64(n))
    h1, h0 = limbs32(hi)
    l1, l0 = limbs32(lo)
    key, h1, h0, l1, l0, c = jax.lax.sort(
        (key.astype(jnp.int32), h1, h0, l1, l0, group_sum), num_keys=1)
    out_hi = h1.astype(U64) << 32 | h0.astype(U64)
    out_lo = l1.astype(U64) << 32 | l0.astype(U64)
    n_groups = seg[-1] + 1
    has_sentinel = (lo[-1] == U64(SENTINEL)) & (hi[-1] == U64(SENTINEL))
    n_unique = jnp.where(has_sentinel, n_groups - 1, n_groups)
    live = jnp.arange(n) < n_unique
    return (
        jnp.where(live, out_lo, U64(SENTINEL)),
        jnp.where(live, out_hi, U64(SENTINEL)),
        jnp.where(live, c, 0),
        n_unique,
    )


def count_chunk(lo, hi, valid, weights=None):
    """Sort a chunk of raw k-mer lanes and return its deduped spectrum."""
    lo, hi = mask_to_sentinel(lo, hi, valid)
    if weights is None:
        weights = valid.astype(jnp.int64)
    else:
        weights = jnp.where(valid, weights, 0)
    lo, hi, w = sort_by_kmer(lo, hi, weights)
    return dedup_sorted(lo, hi, w)


def merge_runs(alo, ahi, ac, blo, bhi, bc, narrow: bool = False):
    """Merge two sorted deduped runs (counts summed on equal keys).

    ``narrow=True`` (keys < 2^62, i.e. rho <= 31): merge-path via two
    searchsorted passes + a permutation scatter — O(n log n) gathers
    instead of re-sorting, and the hi plane is reconstructed from the
    sentinel pattern rather than carried.
    """
    if not narrow:
        lo = jnp.concatenate([alo, blo])
        hi = jnp.concatenate([ahi, bhi])
        c = jnp.concatenate([ac, bc])
        lo, hi, c = sort_by_kmer(lo, hi, c)
        return dedup_sorted(lo, hi, c)
    lo = jnp.concatenate([alo, blo])
    c = jnp.concatenate([ac, bc])
    lo, c = sort_by_kmer_u64(lo, c)
    lo2, c2, nu = dedup_sorted_u64(lo, c)
    return lo2, hi_from_lo(lo2), c2, nu


def hi_from_lo(lo):
    """Reconstruct the hi plane for narrow keys (sentinel-or-zero)."""
    return jnp.where(lo == U64(SENTINEL), U64(SENTINEL), U64(0))


def sort_by_kmer_u64(lo, *payloads):
    """Ascending sort by a single u64 key plane (narrow keys)."""
    h, l = limbs32(lo)
    out = jax.lax.sort((h, l) + tuple(payloads), num_keys=2)
    return (out[0].astype(U64) << 32 | out[1].astype(U64),) + tuple(out[2:])


def dedup_sorted_u64(lo, counts):
    """Narrow-key variant of :func:`dedup_sorted` (cumsum/cummax + 1 sort)."""
    n = lo.shape[0]
    is_new = jnp.ones((n,), dtype=bool)
    if n > 1:
        is_new = is_new.at[1:].set(lo[1:] != lo[:-1])
    group_sum, is_last, seg = _group_sums_sorted(is_new, counts)
    key = jnp.where(is_last, seg, jnp.int64(n))
    l1, l0 = limbs32(lo)
    key, l1, l0, c = jax.lax.sort(
        (key.astype(jnp.int32), l1, l0, group_sum), num_keys=1)
    out_lo = l1.astype(U64) << 32 | l0.astype(U64)
    n_groups = seg[-1] + 1
    has_sentinel = lo[-1] == U64(SENTINEL)
    n_unique = jnp.where(has_sentinel, n_groups - 1, n_groups)
    live = jnp.arange(n) < n_unique
    return (
        jnp.where(live, out_lo, U64(SENTINEL)),
        jnp.where(live, c, 0),
        n_unique,
    )


def count_chunk_narrow(lo, valid, weights=None):
    """Narrow-key chunk spectrum: sort + dedup on the lo plane only."""
    s = U64(SENTINEL)
    lo = jnp.where(valid, lo, s)
    if weights is None:
        weights = valid.astype(jnp.int64)
    else:
        weights = jnp.where(valid, weights, 0)
    lo, w = sort_by_kmer_u64(lo, weights)
    lo2, c2, nu = dedup_sorted_u64(lo, w)
    return lo2, hi_from_lo(lo2), c2, nu
