"""Scaffold placement: ordering, gap estimation, rc merging."""

import random

import numpy as np

from gossamer_tpu.algo.scaffold import build_scaffold, scaffold
from gossamer_tpu.graph.build import build_graph
from gossamer_tpu.graph.entry_edge_set import EntryEdgeSet
from gossamer_tpu.graph.supergraph import SuperGraph
from gossamer_tpu.io.readers import Read

K = 15


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def rc(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def mk_reads(seqs):
    return [Read(f"r{i}", s, None) for i, s in enumerate(seqs)]


def test_scaffold_joins_gap_bridged_contigs():
    rng = random.Random(123)
    left = rand_seq(rng, 400)
    gap = rand_seq(rng, 60)     # never sequenced: contigs stay separate
    right = rand_seq(rng, 400)
    genome = left + gap + right

    # coverage reads over the two flanks only (the gap is dark)
    reads = []
    for s in range(0, len(left) - 60, 7):
        reads.append(left[s : s + 60])
    for s in range(0, len(right) - 60, 7):
        reads.append(right[s : s + 60])

    # read pairs spanning the junction with insert 240
    L, ins = 50, 240
    lhs, rhs = [], []
    r = random.Random(7)
    for _ in range(120):
        s = r.randrange(len(left) - ins, len(left) + len(gap) - 10)
        s = max(0, min(s, len(genome) - ins))
        frag = genome[s : s + ins]
        lhs.append(frag[:L])
        rhs.append(rc(frag[-L:]))

    g = build_graph(mk_reads(reads), K, chunk=4096)
    e = EntryEdgeSet.build(g)
    sg = SuperGraph.create(e)

    pairs = list(zip(mk_reads(lhs), mk_reads(rhs)))
    sc = build_scaffold(sg, g, iter(pairs), insert_size=ins,
                        min_link_count=5)
    assert sc.links, "expected scaffold links across the gap"

    before_live = len([p for p in sg.path_ids() if not sg.is_gap(p)])
    n = scaffold(sg, [sc], g=g, min_link_count=5)
    assert n >= 1, "scaffold should join the two contigs"
    # the joined superpath must contain a positive gap segment roughly
    # the size of the dark region
    from gossamer_tpu.graph.supergraph import seg_is_gap, seg_gap

    gaps = [seg_gap(s) for pid in sg.path_ids()
            for s in sg.segs[pid] if seg_is_gap(s)]
    assert gaps, "joined path should contain a gap segment"
    assert any(0 < gv < 200 for gv in gaps), gaps
