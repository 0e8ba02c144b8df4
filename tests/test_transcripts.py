"""ResolveTranscripts: read-guided per-component transcript extraction.

The decisive case from VERDICT r2: two isoforms sharing an exon must
come out as the two real transcripts, not merged fragments and not the
read-unsupported cross products — requires the reference's per-path
read-riding semantics (``ResolveTranscripts.cc:2423-2940``)."""

import io
import random

import numpy as np
import pytest

from gossamer_tpu.algo.transcripts import ResolveTranscripts, assemble_transcripts, read_edge_ranks
from gossamer_tpu.core import kmer as K
from gossamer_tpu.graph.build import build_graph
from gossamer_tpu.io.readers import Read




def rc(s: str) -> str:
    return "".join("TGCA"["ACGT".index(c)] for c in reversed(s))


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


S_LEN = 13  # shared exon: k + 2 -> exactly one shared (k+1)-mer edge


@pytest.fixture
def isoforms():
    rng = random.Random(11)
    while True:
        a1, a2 = rand_seq(rng, 60), rand_seq(rng, 60)
        s = rand_seq(rng, S_LEN)
        b1, b2 = rand_seq(rng, 60), rand_seq(rng, 60)
        i1 = a1 + s + b1
        i2 = a2 + s + b2
        # demand unique 12-mer edges apart from the shared-exon interior
        k = 11
        kmers = [i1[j : j + k + 1] for j in range(len(i1) - k)]
        kmers += [i2[j : j + k + 1] for j in range(len(i2) - k)]
        kmers += [rc(x) for x in kmers]
        shared = sum(1 for x in set(kmers) if kmers.count(x) > 1)
        if shared <= 2 * (S_LEN - k):  # only the shared-exon interior
            return i1, i2


def tiled_pairs(seq: str, read_len=40, step=5, phase=2):
    """Tiled reads with starts on phase+step*i — the phase keeps any
    read's FIRST edge out of the shared exon interior (starts 60..61
    are off-grid), so junction support comes only from reads that
    genuinely straddle a junction."""
    reads = [seq[p : p + read_len]
             for p in range(phase, len(seq) - read_len + 1, step)]
    return [(K.encode_bases(reads[i]), K.encode_bases(reads[min(i + 2, len(reads) - 1)]))
            for i in range(len(reads))]


def test_two_isoforms_resolved(isoforms):
    i1, i2 = isoforms
    k = 11
    reads = [Read(b"g1", i1.encode()), Read(b"g2", i2.encode())]
    g = build_graph(reads, k, chunk=4096)
    pairs = tiled_pairs(i1) + tiled_pairs(i2)
    out = io.StringIO()
    n = assemble_transcripts(g, pairs, out, min_length=80)
    assert n >= 2
    text = out.getvalue()
    seqs = []
    for block in text.split(">")[1:]:
        lines = block.splitlines()
        seqs.append("".join(lines[1:]))
    seqs = seqs + [rc(s) for s in seqs]

    s = i1[60 : 60 + S_LEN]
    # junction signatures spanning A-end + shared exon + B-start
    sig_i1 = i1[50:60] + s + i1[60 + S_LEN :][:10]
    sig_i2 = i2[50:60] + s + i2[60 + S_LEN :][:10]
    sig_x1 = i1[50:60] + s + i2[60 + S_LEN :][:10]  # A1-S-B2
    sig_x2 = i2[50:60] + s + i1[60 + S_LEN :][:10]  # A2-S-B1

    assert any(sig_i1 in q for q in seqs), "isoform 1 not resolved"
    assert any(sig_i2 in q for q in seqs), "isoform 2 not resolved"
    assert not any(sig_x1 in q for q in seqs), "cross product A1-S-B2 emitted"
    assert not any(sig_x2 in q for q in seqs), "cross product A2-S-B1 emitted"
    # full-length resolution: each isoform transcript spans well past
    # both junctions (>= 120 of the 133 bp; coverage-ramp ends may trim)
    assert any(sig_i1 in q and len(q) >= 110 for q in seqs)
    assert any(sig_i2 in q and len(q) >= 110 for q in seqs)


def test_linear_component(isoforms):
    """A single transcript with uniform read cover comes back whole."""
    i1, _ = isoforms
    k = 11
    g = build_graph([Read(b"g", i1.encode())], k, chunk=4096)
    pairs = tiled_pairs(i1)
    out = io.StringIO()
    n = assemble_transcripts(g, pairs, out, min_length=100)
    assert n == 1
    seq = "".join(out.getvalue().split(">")[1].splitlines()[1:])
    # coverage ramps at the extremes fall under the absolute trim
    # threshold (ResolveTranscripts.cc:3055), so ends may shed a few bp
    assert len(seq) >= len(i1) - 16
    assert seq in i1 or rc(seq) in i1


def test_low_coverage_component_skipped(isoforms):
    """Components with fewer than MIN_READS reads produce nothing
    (``ResolveTranscripts.cc:3701``)."""
    i1, _ = isoforms
    g = build_graph([Read(b"g", i1.encode())], 11, chunk=4096)
    pairs = tiled_pairs(i1)[:1]  # one pair = two reads < MIN_READS
    out = io.StringIO()
    n = assemble_transcripts(g, pairs, out, min_length=100)
    assert n == 0


def test_resolver_direct_fpkm(isoforms):
    """Direct resolver use: FPKM scales with read count."""
    i1, _ = isoforms
    g = build_graph([Read(b"g", i1.encode())], 11, chunk=4096)
    codes = [K.encode_bases(i1[p : p + 40]) for p in range(0, 100, 5)]
    mapped = read_edge_ranks(g, codes)
    out = io.StringIO()
    res = ResolveTranscripts("c0", g, out, 50, mappable_reads=len(codes))
    for m in mapped:
        res.add_read(*m)
    n = res.process_component()
    assert n >= 1
    assert "~FPKM=" in out.getvalue()
