"""Device counting pipeline vs brute-force spectra."""

import random

import numpy as np
import pytest

from gossamer_tpu.io.readers import Read
from gossamer_tpu.io.stream import flat_code_chunks
from gossamer_tpu.ops.count import count_rho_mers

from specmodel import M64, spectrum_build_graph, spectrum_kmer_set


def make_reads(rng, n, length, with_n=True):
    reads = []
    for i in range(n):
        bases = "ACGT" + ("N" if with_n else "")
        s = "".join(rng.choice(bases) for _ in range(length))
        reads.append(Read(str(i), s.encode()))
    return reads


def as_dict(lo, hi, c):
    return {(int(h) << 64) | int(l): int(x) for l, h, x in zip(lo, hi, c)}


@pytest.mark.parametrize("rho,chunk", [(26, 256), (62, 128)])
def test_build_graph_spectrum(rho, chunk):
    rng = random.Random(rho)
    reads = make_reads(rng, 30, 90)
    lo, hi, c = count_rho_mers(
        reads, rho, both_strands=True, canonical=False, chunk=chunk
    )
    want = spectrum_build_graph([r.seq.decode() for r in reads], rho)
    got = as_dict(lo, hi, c)
    assert got == want
    # sorted ascending by 128-bit value
    v = [(int(h) << 64) | int(l) for l, h in zip(lo, hi)]
    assert v == sorted(v)


@pytest.mark.parametrize("k,chunk", [(25, 256), (55, 256)])
def test_kmer_set_spectrum(k, chunk):
    rng = random.Random(k * 3)
    reads = make_reads(rng, 25, 80)
    lo, hi, c = count_rho_mers(
        reads, k, both_strands=False, canonical=True, chunk=chunk
    )
    want = spectrum_kmer_set([r.seq.decode() for r in reads], k)
    got = {(int(h) << 64) | int(l) for l, h in zip(lo, hi)}
    assert got == want
    assert (c > 0).all()


def test_flat_chunks_window_count():
    rng = random.Random(1)
    reads = make_reads(rng, 13, 37, with_n=False)
    k = 5
    total_windows = 0
    for codes in flat_code_chunks(reads, k, chunk=64):
        assert len(codes) == 64 + k - 1
        arr = codes
        for p in range(64):
            w = arr[p : p + k]
            if (w < 4).all():
                total_windows += 1
    want = sum(len(r.seq) - k + 1 for r in reads)
    assert total_windows == want


def test_spill_path():
    # force host spill with tiny spill threshold
    rng = random.Random(9)
    reads = make_reads(rng, 40, 60)
    lo, hi, c = count_rho_mers(
        reads, 25, both_strands=True, canonical=False, chunk=128, spill_entries=64
    )
    want = spectrum_build_graph([r.seq.decode() for r in reads], 25)
    assert as_dict(lo, hi, c) == want


def test_empty_input():
    lo, hi, c = count_rho_mers([], 25, both_strands=True, canonical=False, chunk=64)
    assert len(lo) == 0 and len(hi) == 0 and len(c) == 0
