"""Wide-key engine v2 (31 < k <= 62): parity vs the brute-force model."""

import random

import numpy as np
import pytest

from gossamer_tpu.io.readers import Read
from gossamer_tpu.io.stream import flat_code_chunks
from gossamer_tpu.ops.count import count_rho_mers
from gossamer_tpu.ops.engine_wide import SpectrumEngineWide, wide_keys

from specmodel import py_normalize, py_revcomp, read_kmers


def make_reads(rng, n, length):
    return [
        Read(str(i), "".join(
            rng.choice("ACGTN") if rng.random() < 0.02
            else rng.choice("ACGT") for _ in range(length)).encode())
        for i in range(n)
    ]


def oracle_spectrum(reads, rho, *, both, canon):
    from collections import Counter

    c = Counter()
    for r in reads:
        for v in read_kmers(r.seq.decode(), rho):
            if canon:
                v = py_normalize(v, rho)
            c[v] += 1
            if both:
                c[py_revcomp(v, rho)] += 1
    return dict(c)


def to_dict(lo, hi, counts):
    return {(int(h) << 64) | int(l): int(c)
            for l, h, c in zip(lo, hi, counts)}


@pytest.mark.parametrize("rho,mode", [(40, "plain"), (40, "ref"),
                                      (62, "plain"), (63, "value")])
def test_wide_engine_parity(rho, mode):
    assert wide_keys(rho)
    rng = random.Random(rho)
    reads = make_reads(rng, 30, 90)
    eng = SpectrumEngineWide(rho, mode, 256, cap=1 << 14)
    for codes in flat_code_chunks(reads, rho, chunk=256):
        eng.add_chunk(codes)
    if mode == "value":
        lo, hi, c = eng.finish_expanded()
        want = oracle_spectrum(reads, rho, both=True, canon=False)
    else:
        lo, hi, c = eng.finish()
        want = oracle_spectrum(reads, rho, both=False,
                               canon=(mode == "ref"))
        if mode == "ref":
            want = {k: sum(vv for kk, vv in
                           oracle_spectrum(reads, rho, both=False,
                                           canon=True).items()
                           if kk == k) for k in want}
    got = to_dict(lo, hi, c)
    assert got == want
    # sorted by (hi, lo)
    key = [(int(h), int(l)) for l, h in zip(lo, hi)]
    assert key == sorted(key)


def test_wide_engine_multi_batch_and_spill():
    rho = 40
    rng = random.Random(7)
    reads = make_reads(rng, 120, 100)
    eng = SpectrumEngineWide(rho, "plain", 128, cap=1 << 11, spill=True)
    for codes in flat_code_chunks(reads, rho, chunk=128):
        eng.add_chunk(codes)
    lo, hi, c = eng.finish()
    want = oracle_spectrum(reads, rho, both=False, canon=False)
    assert to_dict(lo, hi, c) == want
    assert eng.spills > 0  # the cap really was exceeded mid-stream


def test_wide_count_rho_mers_build_graph_path():
    """count_rho_mers routes wide keys through the new engine and the
    build-graph symmetric expansion matches the model."""
    rho = 33  # k = 32: first wide size
    rng = random.Random(5)
    reads = make_reads(rng, 25, 80)
    lo, hi, c = count_rho_mers(reads, rho, both_strands=True,
                               canonical=False, chunk=256)
    want = oracle_spectrum(reads, rho, both=True, canon=False)
    assert to_dict(lo, hi, c) == want


def test_wide_kmer_set_parity():
    """build-kmer-set semantics at k = 45 (FNV canonicalization)."""
    rho = 45
    rng = random.Random(9)
    reads = make_reads(rng, 20, 90)
    lo, hi, c = count_rho_mers(reads, rho, both_strands=False,
                               canonical=True, chunk=256)
    want = {py_normalize(v, rho)
            for r in reads for v in read_kmers(r.seq.decode(), rho)}
    got = {(int(h) << 64) | int(l) for l, h in zip(lo, hi)}
    assert got == want
