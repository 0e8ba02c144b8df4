"""Bowtie-graph integration tests, mirroring the reference's
tests/169_supergraphOfBowtie and tests/170_pairs scenarios (topologically
identical generated fixtures; no reference data copied)."""

import io
import random

from gossamer_tpu.algo.super_contigs import print_supergraph_contigs
from gossamer_tpu.algo.threading import thread_pairs, thread_reads
from gossamer_tpu.graph.build import build_graph
from gossamer_tpu.graph.entry_edge_set import EntryEdgeSet
from gossamer_tpu.graph.supergraph import SuperGraph
from gossamer_tpu.io.readers import Read


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def rc(s):
    return "".join("TGCA"["ACGT".index(c)] for c in reversed(s))


def mk_reads(seqs):
    return [Read(str(i), s.encode()) for i, s in enumerate(seqs)]


K = 15


def test_bowtie_thread_reads_resolves_paths():
    r"""Bowtie:  A \___shared___/ C    reads A+S+C and B+S+D exist;
                 B /            \ D   threading must keep them apart."""
    rng = random.Random(169)
    shared = rand_seq(rng, 40)
    a, b = rand_seq(rng, 80), rand_seq(rng, 80)
    c, d = rand_seq(rng, 80), rand_seq(rng, 80)
    seq1 = a + shared + c
    seq2 = b + shared + d
    reads = mk_reads([seq1, seq2] * 2)

    g = build_graph(reads, K, chunk=4096)
    entries = EntryEdgeSet.build(g)
    sg = SuperGraph.create(entries)

    # before threading: linear segments only — the bowtie middle is shared
    out = io.StringIO()
    print_supergraph_contigs(sg, g, out)
    before = ["".join(ch.splitlines()[1:]) for ch in out.getvalue().split(">") if ch]
    assert not any(seq1 in s or rc(seq1) in s for s in before), \
        "full path should not exist before threading"

    thread_reads(sg, g, reads, min_link_count=0, expected_coverage=4)

    out = io.StringIO()
    print_supergraph_contigs(sg, g, out, min_length=0)
    after = ["".join(ch.splitlines()[1:]) for ch in out.getvalue().split(">") if ch]

    # Reference semantics (gold parity, tests/test_ref_parity_threading):
    # the KmerAligner fast path keeps attributing shared-middle k-mers
    # to the entered arm, so the link carries gap 0 and the join is the
    # DIRECT [arm, arm] concatenation — each resolved contig pairs the
    # correct arms (A..C, B..D, never crossed), with the shared middle
    # left as its own path (GossCmdThreadReads.cc:516-523 gap==0 branch).
    def paired(x, y):
        return any((x[5:35] in s and y[-35:-5] in s)
                   or (rc(y)[5:35] in s and rc(x)[-35:-5] in s)
                   for s in after)

    assert paired(a, c) and paired(b, d), (
        f"threading should pair the correct arms; lens="
        f"{sorted(len(s) for s in after)}")
    assert not paired(a, d) and not paired(b, c), "arms must not cross"


def test_pairs_span_repeat():
    """170_pairs analog: single reads cannot span the repeat, pairs can."""
    rng = random.Random(170)
    shared = rand_seq(rng, 60)  # longer than any read
    a, c = rand_seq(rng, 90), rand_seq(rng, 90)
    b, d = rand_seq(rng, 90), rand_seq(rng, 90)
    seq1 = a + shared + c
    seq2 = b + shared + d
    genome_reads = []
    pairs = []
    rlen = 40
    insert = 160
    for seq in (seq1, seq2):
        for p in range(0, len(seq) - rlen + 1, 7):
            genome_reads.append(seq[p : p + rlen])
        for p in range(0, len(seq) - insert + 1, 11):
            frag = seq[p : p + insert]
            pairs.append((frag[:rlen], rc(frag[-rlen:])))

    g = build_graph(mk_reads(genome_reads), K, chunk=8192)
    entries = EntryEdgeSet.build(g)
    sg = SuperGraph.create(entries)
    pair_reads = [
        (Read(f"p{i}/1", l.encode()), Read(f"p{i}/2", r.encode()))
        for i, (l, r) in enumerate(pairs)
    ]
    n = thread_pairs(sg, g, pair_reads, min_link_count=1,
                     insert_size=insert, expected_coverage=6)
    out = io.StringIO()
    print_supergraph_contigs(sg, g, out, min_length=0)
    after = ["".join(ch.splitlines()[1:]) for ch in out.getvalue().split(">") if ch]
    # pairs spanning the shared segment should join the unique arms
    longest = max(len(s) for s in after)
    assert longest > 120, f"pair threading should extend contigs, got {longest}"
