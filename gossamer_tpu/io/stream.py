"""Flat 2-bit base streams for device kmerization.

Instead of the reference's per-read k-mer cursors (``src/GossRead.hh``
``Iterator``/``firstKmer``/``nextKmer``), reads are concatenated into one
flat code stream with a separator code (255) between reads.  Any k-mer
window containing a separator or an invalid base is masked out on device,
which reproduces exactly the reference's "skip windows with non-ACGT
bases" semantics (``src/GossReadBaseString.hh:52-103``) with zero padding
waste and fully static shapes.

Each yielded chunk has ``chunk + k - 1`` codes; the window start positions
``0..chunk-1`` belong to this chunk, and the trailing ``k-1`` codes
overlap the next chunk so no window is lost or double-counted.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

from ..core.kmer import encode_bases
from .readers import Read

SEP = np.uint8(255)


def flat_code_chunks(
    reads: Iterable[Read], k: int, chunk: int = 1 << 22
) -> Iterator[np.ndarray]:
    """Yield uint8 arrays of length ``chunk + k - 1`` (last one padded)."""
    tail = np.full(k - 1, SEP, dtype=np.uint8) if k > 1 else np.zeros(0, np.uint8)
    buf: list[np.ndarray] = [tail]
    # Number of *window-start* positions currently buffered.  The first
    # k-1 codes of the buffer are the previous chunk's overlap region and
    # their windows belong to the previous chunk.
    have = 0

    sep = np.array([SEP], dtype=np.uint8)
    for read in reads:
        codes = encode_bases(read.seq)
        buf.append(codes)
        buf.append(sep)
        have += len(codes) + 1
        while have >= chunk:
            data = np.concatenate(buf)
            out = data[: chunk + k - 1]
            rest = data[chunk:]
            buf = [rest]
            have = len(rest) - (k - 1)
            yield out
    if have > 0:
        data = np.concatenate(buf)
        pad = chunk + k - 1 - len(data)
        if pad > 0:
            data = np.concatenate([data, np.full(pad, SEP, dtype=np.uint8)])
        yield data[: chunk + k - 1]


def pack_chunk(codes: np.ndarray, k: int, chunk: int | None = None):
    """Pack one flat code chunk into the engine's packed-transfer format.

    Returns ``(words, inval)`` per :func:`gossamer_tpu.ops.engine.
    kmerize_packed`: uint32 big-endian 2-bit words (base p at bits
    ``[30 - 2*(p % 16), +2)`` of word ``p // 16``) plus the little-endian
    invalid-code bitmap.  Transfer volume: 0.375 B/base vs 1 B/base for
    raw codes.
    """
    C = chunk if chunk is not None else len(codes) - k + 1
    assert C % 16 == 0 and len(codes) == C + k - 1
    bad = codes > 3
    inval = np.packbits(bad, bitorder="little")
    c = np.where(bad, 0, codes).astype(np.uint32)
    W = C // 16 + 2
    pad = W * 16 - len(c)
    if pad > 0:
        c = np.concatenate([c, np.zeros(pad, np.uint32)])
    m = c[: W * 16].reshape(W, 16)
    shifts = (30 - 2 * np.arange(16)).astype(np.uint32)
    words = np.bitwise_or.reduce(m << shifts, axis=1).astype(np.uint32)
    return words, inval


def pack_chunk_sparse(codes: np.ndarray, k: int, chunk: int | None = None,
                      max_pos: int | None = None):
    """:func:`pack_chunk` with SPARSE invalidity: ``(words, invpos,
    n_windows)`` per :func:`gossamer_tpu.ops.engine.kmerize_packed_sparse`.

    ``invpos`` lists the sorted positions of invalid codes padded to
    ``max_pos`` entries (default C // 64) with out-of-range values;
    returns None when the chunk has more invalid codes than that (the
    caller falls back to the bitmap format).  ~0.26 B/base on the wire
    for 100 bp reads vs 0.375 for the bitmap format.
    """
    C = chunk if chunk is not None else len(codes) - k + 1
    assert C % 16 == 0 and len(codes) == C + k - 1
    P = max_pos if max_pos is not None else C // 64
    # a trailing invalid run (final-chunk padding) is carried by
    # n_windows instead of positions
    nz = np.nonzero(codes <= 3)[0]
    t = int(nz[-1]) + 1 if len(nz) else 0
    n_win = max(0, min(C, t - k + 1))
    bad = np.nonzero(codes[:t] > 3)[0]
    if len(bad) > P:
        return None
    invpos = np.full(P, C + k, np.uint32)
    invpos[: len(bad)] = bad
    c = np.where(codes > 3, 0, codes).astype(np.uint32)
    W = C // 16 + 2
    pad = W * 16 - len(c)
    if pad > 0:
        c = np.concatenate([c, np.zeros(pad, np.uint32)])
    m = c[: W * 16].reshape(W, 16)
    shifts = (30 - 2 * np.arange(16)).astype(np.uint32)
    words = np.bitwise_or.reduce(m << shifts, axis=1).astype(np.uint32)
    return words, invpos, n_win


def packed_code_chunks(
    reads: Iterable[Read], k: int, chunk: int = 1 << 22
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """:func:`flat_code_chunks` packed via :func:`pack_chunk`."""
    for codes in flat_code_chunks(reads, k, chunk=chunk):
        yield pack_chunk(codes, k, chunk)
