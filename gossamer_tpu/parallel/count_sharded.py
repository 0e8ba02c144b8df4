"""Multi-chip k-mer counting: data-parallel reads, k-mer-space sharding.

This is the TPU-native replacement for the reference's single-node
spill-and-merge scale story (SURVEY.md §2.10): instead of disk spill
files, chips exchange k-mers over ICI.

Design (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives):

* reads are data-parallel: each chip kmerizes its own slice of the flat
  base stream (``P('d')`` on the chunk batch axis);
* the 128-bit key space is *range-partitioned*: chip ``s`` owns keys with
  top ``log2(N)`` bits equal to ``s``.  Because the partition is by value,
  per-chip spectra are globally ordered — an ``all_gather`` of shard
  spectra is the sorted global spectrum with no extra merge;
* each chip buckets its (deduped) k-mers by owner and an ``all_to_all``
  routes them; the owner re-sorts and dedups.  This is exactly the
  BackyardHash -> spill run -> merge pipeline with ICI instead of disk;
* count histograms reduce with ``psum``.

All collective code lives inside one ``shard_map``-decorated step so XLA
schedules the a2a against the sort pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import device_kmer as dk
from ..ops import sort as ds

U64 = jnp.uint64


def owner_of(lo, hi, rho: int, n_shards: int):
    """Owner shard = top log2(n) bits of the 2*rho-bit key."""
    bits = int(np.log2(n_shards))
    if bits == 0:
        return jnp.zeros(lo.shape, dtype=jnp.int32)
    top = 2 * rho - bits  # position of the partition bits
    if top >= 64:
        v = hi >> (top - 64)
    else:
        v = (lo >> top) | (hi << (64 - top)) if top > 0 else lo
    return (v & U64(n_shards - 1)).astype(jnp.int32)


def make_sharded_count_step(mesh: Mesh, rho: int, chunk: int,
                            both_strands: bool, canonical: bool):
    """Build a jitted sharded step: (N, chunk+rho-1) codes ->
    per-shard sorted deduped spectra (N, cap) + global histogram."""
    n = mesh.devices.size
    lanes = chunk * (2 if both_strands else 1)
    # per-destination bucket capacity: 4x the uniform share (detected
    # overflow raises; extreme skew needs a bigger slack or rehash)
    per_dest = min(lanes, max(128, (4 * lanes) // n))
    cap = n * per_dest

    def local_step(codes):
        # codes: (1, chunk+rho-1) local slice
        lo, hi, valid = dk.kmerize_flat(codes[0], rho)
        if canonical:
            lo, hi, _ = dk.normalize(lo, hi, rho)
        if both_strands:
            rlo, rhi = dk.reverse_complement(lo, hi, rho)
            lo = jnp.concatenate([lo, rlo])
            hi = jnp.concatenate([hi, rhi])
            valid = jnp.concatenate([valid, valid])
        # local pre-dedup to shrink the exchange
        lo, hi, cnt, _ = ds.count_chunk(lo, hi, valid)

        # ---- route by owner: bucket into (n, cap/n ... ) ----------------
        owner = owner_of(lo, hi, rho, n)
        owner = jnp.where(cnt > 0, owner, n)  # sentinels route nowhere
        # sort by owner (stable in key order within owner since input
        # sorted ascending and owner is a prefix of the key -> already
        # grouped; sentinel tail stays at the end)
        per = per_dest
        # position of each lane within the full exchange buffer
        starts = jnp.searchsorted(owner, jnp.arange(n, dtype=jnp.int32))
        idx = jnp.arange(lanes)
        slot = idx - starts[jnp.clip(owner, 0, n - 1)]
        dest = jnp.clip(owner, 0, n - 1) * per + jnp.clip(slot, 0, per - 1)
        ok = (owner < n) & (slot < per)
        # one extra trash slot so rejected lanes never clobber real ones
        buf_lo = jnp.full((n * per + 1,), U64(ds.SENTINEL))
        buf_hi = jnp.full((n * per + 1,), U64(ds.SENTINEL))
        buf_c = jnp.zeros((n * per + 1,), dtype=cnt.dtype)
        dest = jnp.where(ok, dest, n * per)
        buf_lo = buf_lo.at[dest].set(jnp.where(ok, lo, U64(ds.SENTINEL)))
        buf_hi = buf_hi.at[dest].set(jnp.where(ok, hi, U64(ds.SENTINEL)))
        buf_c = buf_c.at[dest].add(jnp.where(ok, cnt, 0))
        buf_lo, buf_hi, buf_c = buf_lo[:-1], buf_hi[:-1], buf_c[:-1]
        overflow = jnp.sum(jnp.where((owner < n) & ~ok, cnt, 0))

        # ---- exchange ---------------------------------------------------
        blo = buf_lo.reshape(n, per)
        bhi = buf_hi.reshape(n, per)
        bc = buf_c.reshape(n, per)
        rlo = jax.lax.all_to_all(blo, "d", split_axis=0, concat_axis=0, tiled=True)
        rhi = jax.lax.all_to_all(bhi, "d", split_axis=0, concat_axis=0, tiled=True)
        rc_ = jax.lax.all_to_all(bc, "d", split_axis=0, concat_axis=0, tiled=True)

        # ---- own-range dedup -------------------------------------------
        olo, ohi, oc = rlo.reshape(-1), rhi.reshape(-1), rc_.reshape(-1)
        olo, ohi, oc = ds.sort_by_kmer(olo, ohi, oc)
        olo, ohi, oc, n_uniq = ds.dedup_sorted(olo, ohi, oc)

        # ---- global histogram of multiplicities (psum) ------------------
        hist = jnp.zeros((64,), dtype=jnp.int64)
        bucket = jnp.clip(oc, 0, 63)
        hist = hist.at[bucket].add(jnp.where(oc > 0, 1, 0))
        hist = jax.lax.psum(hist, "d")
        overflow = jax.lax.psum(overflow, "d")
        return (
            olo[None],
            ohi[None],
            oc[None],
            n_uniq[None],
            hist,
            overflow[None],
        )

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=P("d", None),
        out_specs=(P("d", None), P("d", None), P("d", None), P("d"), P(None), P("d")),
        check_vma=False,
    )
    return jax.jit(step)


def sharded_spectrum(codes_batches, mesh: Mesh, rho: int, chunk: int,
                     both_strands: bool = True, canonical: bool = False):
    """Count over an iterable of (N, chunk+rho-1) code batches.

    Returns host (lo, hi, counts) sorted globally, plus the histogram.
    Per-shard runs from successive batches are merged shard-wise under
    the same range partition (log-structured merge as in ops.count).
    """
    n = mesh.devices.size
    step = make_sharded_count_step(mesh, rho, chunk, both_strands, canonical)

    merge = jax.jit(
        shard_map(
            lambda al, ah, ac, bl, bh, bc: tuple(
                x[None] for x in ds.merge_runs(al[0], ah[0], ac[0], bl[0], bh[0], bc[0])[:3]
            ),
            mesh=mesh,
            in_specs=(P("d", None),) * 6,
            out_specs=(P("d", None),) * 3,
            check_vma=False,
        )
    )

    runs: list[tuple] = []
    hist_total = np.zeros(64, dtype=np.int64)
    for codes in codes_batches:
        lo, hi, c, nu, hist, ovf = step(codes)
        if int(np.sum(np.asarray(ovf))) > 0:
            raise RuntimeError("shard exchange overflow; raise capacity")
        hist_total += np.asarray(hist)
        runs.append((lo, hi, c))
        while len(runs) >= 2 and runs[-1][0].shape == runs[-2][0].shape:
            b = runs.pop()
            a = runs.pop()
            runs.append(merge(*a, *b))
    while len(runs) >= 2:
        b = runs.pop()
        a = runs.pop()
        if a[0].shape[1] != b[0].shape[1]:
            pad = a[0].shape[1] - b[0].shape[1]
            b = (
                jnp.pad(b[0], ((0, 0), (0, pad)), constant_values=np.uint64(ds.SENTINEL)),
                jnp.pad(b[1], ((0, 0), (0, pad)), constant_values=np.uint64(ds.SENTINEL)),
                jnp.pad(b[2], ((0, 0), (0, pad))),
            )
        runs.append(merge(*a, *b))
    if not runs:
        z = np.zeros(0, dtype=np.uint64)
        return z, z.copy(), np.zeros(0, dtype=np.int64), hist_total
    lo, hi, c = (np.asarray(x) for x in runs[0])
    # shards are ascending ranges; concatenate and trim sentinels
    out_lo, out_hi, out_c = [], [], []
    for s in range(n):
        live = c[s] > 0
        out_lo.append(lo[s][live])
        out_hi.append(hi[s][live])
        out_c.append(c[s][live])
    return (
        np.concatenate(out_lo),
        np.concatenate(out_hi),
        np.concatenate(out_c),
        hist_total,
    )
