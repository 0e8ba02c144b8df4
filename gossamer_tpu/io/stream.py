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
