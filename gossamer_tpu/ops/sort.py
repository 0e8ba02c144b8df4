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


def dedup_sorted(lo, hi, counts):
    """Collapse equal adjacent keys, summing counts.

    Returns (lo, hi, counts, n_unique) of the same static length; entries
    at index >= n_unique are sentinel with count 0.  Sentinel lanes in the
    input (invalid windows / padding) are excluded from n_unique but
    collapse into one trailing sentinel group.
    """
    n = lo.shape[0]
    is_new = jnp.ones((n,), dtype=bool)
    if n > 1:
        same = (lo[1:] == lo[:-1]) & (hi[1:] == hi[:-1])
        is_new = is_new.at[1:].set(~same)
    seg = jnp.cumsum(is_new) - 1  # group index per lane
    out_c = jax.ops.segment_sum(counts, seg, num_segments=n)
    out_lo = jnp.full((n,), U64(SENTINEL)).at[seg].set(lo)
    out_hi = jnp.full((n,), U64(SENTINEL)).at[seg].set(hi)
    n_groups = seg[-1] + 1 if n > 0 else jnp.int64(0)
    # drop the sentinel group if present
    has_sentinel = (lo[-1] == U64(SENTINEL)) & (hi[-1] == U64(SENTINEL)) if n > 0 else False
    n_unique = jnp.where(has_sentinel, n_groups - 1, n_groups)
    # zero counts beyond n_unique and force sentinel keys there
    idx = jnp.arange(n)
    live = idx < n_unique
    out_c = jnp.where(live, out_c, 0)
    out_lo = jnp.where(live, out_lo, U64(SENTINEL))
    out_hi = jnp.where(live, out_hi, U64(SENTINEL))
    return out_lo, out_hi, out_c, n_unique


def count_chunk(lo, hi, valid, weights=None):
    """Sort a chunk of raw k-mer lanes and return its deduped spectrum."""
    lo, hi = mask_to_sentinel(lo, hi, valid)
    if weights is None:
        weights = valid.astype(jnp.int64)
    else:
        weights = jnp.where(valid, weights, 0)
    lo, hi, w = sort_by_kmer(lo, hi, weights)
    return dedup_sorted(lo, hi, w)


def merge_runs(alo, ahi, ac, blo, bhi, bc):
    """Merge two sorted deduped runs (counts summed on equal keys)."""
    lo = jnp.concatenate([alo, blo])
    hi = jnp.concatenate([ahi, bhi])
    c = jnp.concatenate([ac, bc])
    lo, hi, c = sort_by_kmer(lo, hi, c)
    return dedup_sorted(lo, hi, c)
