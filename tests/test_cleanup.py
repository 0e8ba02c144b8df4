"""Cleanup passes: trim-graph, prune-tips, pop-bubbles (TourBus)."""

import random

import numpy as np

from gossamer_tpu.algo.cleanup import prune_tips_once, trim_graph
from gossamer_tpu.graph.trimmer import TrimView
from gossamer_tpu.algo.tour_bus import pop_bubbles
from gossamer_tpu.graph.build import build_graph
from gossamer_tpu.io.readers import Read

from specmodel import py_encode, read_kmers


def mk_reads(seqs):
    return [Read(str(i), s.encode()) for i, s in enumerate(seqs)]


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_trim_graph_drops_low_coverage():
    rng = random.Random(0)
    main = rand_seq(rng, 120)
    noise = rand_seq(rng, 40)
    reads = mk_reads([main] * 5 + [noise])
    g = build_graph(reads, 11, chunk=4096)
    g2 = trim_graph(g, 3)
    assert g2.count < g.count
    assert (g2.counts >= 3).all()
    assert not g2.lint()
    # all main-sequence edges survive
    for v in read_kmers(main, 12):
        lo = np.uint64(v & ((1 << 64) - 1))
        hi = np.uint64(v >> 64)
        hit, _ = g2.access_and_rank(lo, hi)
        assert hit.all()


def test_prune_tips_removes_short_tip():
    rng = random.Random(1)
    k = 11
    backbone = rand_seq(rng, 200)
    # a tip: branches off backbone at position 100, short dead end
    tip = backbone[80:100] + rand_seq(rng, 8)
    reads = mk_reads([backbone] * 4 + [tip] * 2)
    g = build_graph(reads, k, chunk=4096)
    view = TrimView(g)
    tips, zapped = prune_tips_once(view)
    g2 = view.finalize()
    assert tips >= 1
    assert zapped >= 2
    assert not g2.lint()
    # backbone intact
    for v in read_kmers(backbone, k + 1):
        lo = np.uint64(v & ((1 << 64) - 1))
        hi = np.uint64(v >> 64)
        hit, _ = g2.access_and_rank(lo, hi)
        assert hit.all()
    # the tip's unique terminal edges are gone
    tip_only = set(read_kmers(tip, k + 1)) - set(read_kmers(backbone, k + 1))
    gone = 0
    for v in tip_only:
        lo = np.uint64(v & ((1 << 64) - 1))
        hi = np.uint64(v >> 64)
        hit, _ = g2.access_and_rank(lo, hi)
        if not hit.any():
            gone += 1
    assert gone > 0


def test_prune_tips_keeps_isolated_path():
    rng = random.Random(2)
    iso = rand_seq(rng, 60)
    g = build_graph(mk_reads([iso]), 11, chunk=4096)
    view = TrimView(g)
    tips, zapped = prune_tips_once(view)
    g2 = view.finalize()
    assert tips == 0 and zapped == 0
    assert g2.count == g.count


def test_pop_bubbles_snp():
    rng = random.Random(3)
    k = 11
    s1 = rand_seq(rng, 60)
    s2 = rand_seq(rng, 60)
    major = s1 + "A" + s2
    minor = s1 + "C" + s2
    reads = mk_reads([major] * 5 + [minor] * 2)
    g = build_graph(reads, k, chunk=4096)
    g2, popped = pop_bubbles(g)
    assert popped >= 1
    assert g2.count < g.count
    assert not g2.lint()
    # major variant fully intact
    for v in read_kmers(major, k + 1):
        lo = np.uint64(v & ((1 << 64) - 1))
        hi = np.uint64(v >> 64)
        hit, _ = g2.access_and_rank(lo, hi)
        assert hit.all()
    # minor-only edges removed
    minor_only = set(read_kmers(minor, k + 1)) - set(read_kmers(major, k + 1))
    for v in minor_only:
        lo = np.uint64(v & ((1 << 64) - 1))
        hi = np.uint64(v >> 64)
        hit, _ = g2.access_and_rank(lo, hi)
        assert not hit.any(), "minority bubble branch should be popped"


def test_pop_bubbles_equal_time_tie():
    """Uniform-coverage bubble: both arms same length AND same weight, so
    the join node is reached twice at the same *total* time.

    Parity pin for ``TourBus.cc:755-783``: the equal-time skip compares
    the stored time against the ORIGIN time (``destTime == pOriginTime``),
    not the new total time, so an equal-total-time tie still reaches
    analyseEdge and the bubble is popped.  (isOnPredecessorChain is
    stubbed ``return true`` in the reference, ``TourBus.cc:787-791``.)
    """
    rng = random.Random(7)
    k = 11
    s1 = rand_seq(rng, 60)
    s2 = rand_seq(rng, 60)
    major = s1 + "A" + s2
    minor = s1 + "C" + s2
    # identical read counts => identical arm weights => tied times
    reads = mk_reads([major] * 3 + [minor] * 3)
    g = build_graph(reads, k, chunk=4096)
    g2, popped = pop_bubbles(g)
    assert popped >= 1, "equal-total-time bubble must still be analysed"
    assert g2.count < g.count
    assert not g2.lint()
    # exactly one arm survives: the SNP column keeps a single variant
    maj_only = set(read_kmers(major, k + 1)) - set(read_kmers(minor, k + 1))
    min_only = set(read_kmers(minor, k + 1)) - set(read_kmers(major, k + 1))

    def arm_alive(vals):
        alive = 0
        for v in vals:
            lo = np.uint64(v & ((1 << 64) - 1))
            hi = np.uint64(v >> 64)
            hit, _ = g2.access_and_rank(lo, hi)
            if hit.any():
                alive += 1
        return alive

    a, b = arm_alive(maj_only), arm_alive(min_only)
    assert (a == 0) != (b == 0), "exactly one arm should be trimmed"


def test_pop_bubbles_no_bubble_untouched():
    rng = random.Random(4)
    seq = rand_seq(rng, 150)
    g = build_graph(mk_reads([seq] * 3), 11, chunk=4096)
    g2, popped = pop_bubbles(g)
    assert popped == 0
    assert g2.count == g.count


def test_prune_tips_iterative_single_compaction():
    """Nested tips need pass 2 to see pass 1's deletions through the
    shared bitmap (TrimView); the edge array is rewritten once."""
    from gossamer_tpu.algo.cleanup import prune_tips

    rng = random.Random(8)
    k = 11
    backbone = rand_seq(rng, 300)
    # layered tip: a branch off the backbone which itself has a branch;
    # the inner stub only becomes a tip after the outer one is pruned
    outer = backbone[120:140] + rand_seq(rng, 30)
    inner = outer[20:40] + rand_seq(rng, 6)
    reads = mk_reads([backbone] * 6 + [outer] * 2 + [inner] * 2)
    g = build_graph(reads, k, chunk=4096)
    calls = []
    orig = g.remove_edges

    def counting_remove(dead):
        calls.append(int(dead.sum()))
        return orig(dead)

    g.remove_edges = counting_remove
    g2 = prune_tips(g, iterations=5)
    assert len(calls) == 1, "prune-tips must compact exactly once"
    assert not g2.lint()
    for v in read_kmers(backbone, k + 1):
        hit, _ = g2.access_and_rank(np.uint64(v & ((1 << 64) - 1)),
                                    np.uint64(v >> 64))
        assert hit.all()


def test_narrow_graph_footprint():
    """Narrow graphs store ~12 B/edge: broadcast-zero hi, u32 counts
    on disk (VERDICT r2 item 9)."""
    from gossamer_tpu.io.factory import StringFileFactory

    rng = random.Random(4)
    g = build_graph(mk_reads([rand_seq(rng, 500)] * 3), 15, chunk=4096)
    assert g.hi.strides == (0,)  # zero-stride broadcast view
    fac = StringFileFactory()
    g.write("g", fac)
    g2 = type(g).read("g", fac)
    assert g2.counts.dtype == np.uint32
    assert g2.stat()["bits-per-edge"] <= 97.0  # 12 B/edge + slack
    np.testing.assert_array_equal(g2.lo, g.lo)
    np.testing.assert_array_equal(np.asarray(g2.counts, np.int64),
                                  np.asarray(g.counts, np.int64))
