"""Interop: open artifacts written by the reference's own Builders.

Fixtures under tests/data/ref_format/ were produced by
``scripts/baseline/make_ref_graph.cc`` — the reference's unmodified
Graph::Builder / KmerSet::Builder (SparseArray Elias-Fano +
VariableByteArray) compiled against the Boost shims; regenerate with
``python scripts/make_ref_fixtures.py``."""

import random
from pathlib import Path

import numpy as np
import pytest

from gossamer_tpu.graph.graph import Graph
from gossamer_tpu.graph.kmer_set import KmerSet
from gossamer_tpu.io.factory import PhysicalFileFactory

from specmodel import py_encode

DATA = Path(__file__).parent / "data" / "ref_format"
FAC = PhysicalFileFactory()


def regen_model(seed=42):
    rng = random.Random(seed)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    return rng, rand_seq


def test_read_reference_graph_k11():
    g = Graph.read(str(DATA / "graph_k11" / "graph"), FAC)
    assert g.k == 11 and not g.asymmetric
    assert not g.lint()
    # parity vs the generator's model
    rng, rand_seq = regen_model()
    genome = rand_seq(300)
    from collections import Counter

    def rc(s):
        return "".join("TGCA"["ACGT".index(c)] for c in reversed(s))

    c = Counter()
    for i in range(len(genome) - 11):
        w = genome[i : i + 12]
        c[w] += 1
        c[rc(w)] += 1
    got = {int(l): int(ct) for l, ct in zip(g.lo, g.counts)}
    want = {py_encode(s): ct for s, ct in c.items()}
    assert got == want


def test_variable_byte_array_layers():
    """Counts spanning all three byte layers decode exactly
    (``src/VariableByteArray.hh:80-103``)."""
    g = Graph.read(str(DATA / "graph_layers" / "graph"), FAC)
    assert g.asymmetric
    counts = set(np.asarray(g.counts, np.int64).tolist())
    assert 300 in counts
    assert 70000 in counts
    assert (1 << 24) in counts


def test_read_reference_kmer_set():
    ks = KmerSet.read(str(DATA / "kset_k25" / "graph"), FAC)
    assert ks.k == 25
    assert ks.count == len(np.unique(ks.lo))
    # keys ascend
    assert (np.diff(ks.lo.astype(np.int64)) > 0).all()


def test_read_reference_graph_wide():
    """68-bit edge keys (k=33) decode across the lo/hi split."""
    g = Graph.read(str(DATA / "graph_k33" / "graph"), FAC)
    assert g.k == 33
    assert g.count == 100
    assert (g.hi <= np.uint64(0xF)).all()  # 68-bit keys
    key = [(int(h), int(l)) for l, h in zip(g.lo, g.hi)]
    assert key == sorted(key)


def test_upgrade_graph_converts(tmp_path):
    """goss upgrade-graph rewrites a reference-format graph in the
    current format, preserving the spectrum byte-for-byte."""
    import shutil

    from gossamer_tpu.cli.goss import build_app

    for f in (DATA / "graph_k11").iterdir():
        shutil.copy(f, tmp_path / f.name)
    base = str(tmp_path / "graph")
    before = Graph.read(base, FAC)
    rc = build_app().main(["upgrade-graph", "-G", base])
    assert rc == 0
    after = Graph.read(base, FAC)
    np.testing.assert_array_equal(before.lo, after.lo)
    np.testing.assert_array_equal(
        np.asarray(before.counts, np.int64),
        np.asarray(after.counts, np.int64))
