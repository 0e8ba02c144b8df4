"""Gold parity: our cleanup passes vs the REFERENCE's own algorithms.

Fixtures in tests/data/ref_cleanup/ were produced by
scripts/make_ref_cleanup_fixtures.py, which compiles the reference's
TourBus + GraphTrimmer + the GossCmdPruneTips decision loop UNMODIFIED
(``/root/reference/src/TourBus.cc``,
``/root/reference/src/GossCmdPruneTips.cc:69-254``) and records the
surviving edge set for synthetic bubble/tip graphs.  Our vectorized
pop-bubbles / prune-tips must reproduce the removal decisions exactly.
"""

import os

import numpy as np
import pytest

from gossamer_tpu.algo.cleanup import prune_tips
from gossamer_tpu.algo.tour_bus import pop_bubbles
from gossamer_tpu.graph.text import restore_graph
from gossamer_tpu.io.factory import StringFileFactory

DATA = os.path.join(os.path.dirname(__file__), "data", "ref_cleanup")

FIXTURES = sorted(os.listdir(DATA)) if os.path.isdir(DATA) else []


def _load(name):
    with open(os.path.join(DATA, name, "input.dump")) as f:
        text = f.read()
    with open(os.path.join(DATA, name, "expected.dump")) as f:
        expected = f.read()
    with open(os.path.join(DATA, name, "args.txt")) as f:
        args = f.read().split()
    fac = StringFileFactory()
    fac.add_file("in.dump", text)
    with fac.open_read_text("in.dump") as fh:
        g = restore_graph(fh)
    return g, expected, args


def _dump_edges(g):
    from gossamer_tpu.core import kmer as K

    if g.count == 0:
        return ""
    mat = K.kmers_to_strings(g.rho, g.lo, g.hi)
    lines = []
    for row, c in zip(mat, g.counts):
        lines.append(row.tobytes().decode() + "\t" + str(int(c)))
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("name", [f for f in FIXTURES
                                  if "pop" in f or "bubble" in f])
def test_pop_bubbles_matches_reference(name):
    g, expected, args = _load(name)
    kw = {}
    if "--cutoff" in args:
        kw["cutoff"] = int(args[args.index("--cutoff") + 1])
    if "--relative-cutoff" in args:
        kw["relative_cutoff"] = float(args[args.index("--relative-cutoff") + 1])
    g2, _ = pop_bubbles(g, **kw)
    assert _dump_edges(g2) == expected


@pytest.mark.parametrize("name", [f for f in FIXTURES if "prune" in f
                                  or "tip" in f])
def test_prune_tips_matches_reference(name):
    g, expected, args = _load(name)
    iterations = 1
    if "--iterate" in args:
        iterations = int(args[args.index("--iterate") + 1])
    kw = {}
    if "--cutoff" in args:
        kw["cutoff"] = int(args[args.index("--cutoff") + 1])
    if "--relative-cutoff" in args:
        kw["relative_cutoff"] = float(args[args.index("--relative-cutoff") + 1])
    g = prune_tips(g, iterations=iterations, **kw)
    assert _dump_edges(g) == expected


@pytest.mark.parametrize("name", [f for f in FIXTURES if "contig" in f])
def test_print_contigs_matches_reference(name):
    """Contig extraction (canonical-end adjustment, stats headers,
    60-col wrap) vs the reference's transcribed printLinearSegments."""
    import io

    from gossamer_tpu.algo.contigs import print_contigs

    g, expected, args = _load(name)
    kw = {}
    if "--min-length" in args:
        kw["min_length"] = int(args[args.index("--min-length") + 1])
    if "--min-coverage" in args:
        kw["min_coverage"] = int(args[args.index("--min-coverage") + 1])
    out = io.StringIO()
    print_contigs(g, out, verbose_headers=True, **kw)
    assert out.getvalue() == expected


@pytest.mark.parametrize("name", [f for f in FIXTURES if "entries" in f])
def test_entry_edge_set_matches_reference(name):
    """EntryEdgeSet::build parity: entry edges, rounded mean counts,
    lengths and endRank vs the reference's own compiled builder."""
    from gossamer_tpu.core import kmer as K
    from gossamer_tpu.graph.entry_edge_set import EntryEdgeSet

    g, expected, args = _load(name)
    e = EntryEdgeSet.build(g)
    mat = K.kmers_to_strings(e.rho, e.lo, e.hi)
    lines = []
    for row, c, l, er in zip(mat, e.counts, e.lengths, e.end_rank):
        lines.append(f"{row.tobytes().decode()}\t{int(c)}\t{int(l)}"
                     f"\t{int(er)}")
    got = "\n".join(lines) + "\n" if lines else ""
    assert got == expected
