"""Write-side interop: our writers must reproduce the reference's own
Builders BYTE-FOR-BYTE.

Each fixture under tests/data/ref_format/ was produced by the
reference's unmodified Graph::Builder / KmerSet::Builder
(``scripts/baseline/make_ref_graph.cc``).  We read the fixture back
with the interop readers, re-write it with
:mod:`gossamer_tpu.io.reference_write`, and require every file of the
set to compare equal — header bytes, Elias-Fano planes, both
DenseSelect acceleration indexes, VariableByteArray layers and the
counts histogram.  Byte identity against the original builders is the
strongest possible conformance test: any artifact we write opens in
the original gossamer binaries.
"""

from pathlib import Path

import numpy as np
import pytest

from gossamer_tpu.io.factory import PhysicalFileFactory, StringFileFactory
from gossamer_tpu.io import reference_format as RF
from gossamer_tpu.io.reference_write import (write_reference_graph,
                                             write_reference_kmer_set)

DATA = Path(__file__).parent / "data" / "ref_format"
FAC = PhysicalFileFactory()

GRAPH_FILES = [
    ".header", "-counts-hist.txt", "-counts.ord0", "-counts.ord1",
    "-counts.ord2",
    "-counts.ord1p.header", "-counts.ord1p.high-bits",
    "-counts.ord1p-d0", "-counts.ord1p-d1",
    "-counts.ord2p.header", "-counts.ord2p.high-bits",
    "-counts.ord2p-d0", "-counts.ord2p-d1",
    "-edges.header", "-edges.high-bits", "-edges-d0", "-edges-d1",
]


def _compare(base_ref: str, fac_out: StringFileFactory, base_out: str,
             names: list[str]) -> None:
    for suffix in names:
        ref_name = base_ref + suffix
        want = RF._read_bytes(FAC, ref_name)
        got = fac_out.read_file(base_out + suffix)
        assert got == want, (
            f"{suffix}: {len(got)} vs {len(want)} bytes, first diff at "
            f"{next((i for i, (a, b) in enumerate(zip(got, want)) if a != b), min(len(got), len(want)))}")


def _low_bits_files(fixture: Path, stem: str) -> list[str]:
    return [p.name[len("graph"):] for p in fixture.glob(f"graph{stem}*")]


@pytest.mark.parametrize("fixture", ["graph_k11", "graph_k33",
                                     "graph_layers"])
def test_graph_write_byte_identical(fixture):
    d = DATA / fixture
    base = str(d / "graph")
    hdr = RF._read_bytes(FAC, base + ".header")
    import struct

    _v, k, flags = struct.unpack_from("<QQQ", hdr, 0)
    lo, hi = RF.read_sparse_array(FAC, base + "-edges")
    counts = RF.read_variable_byte_array(FAC, base + "-counts")[: len(lo)]

    out = StringFileFactory()
    write_reference_graph(out, "graph", int(k), lo, hi, counts,
                          asymmetric=bool(flags & 1))
    names = GRAPH_FILES + _low_bits_files(d, "-edges.low-bits") \
        + _low_bits_files(d, "-counts.ord1p.low-bits") \
        + _low_bits_files(d, "-counts.ord2p.low-bits")
    _compare(base, out, "graph", names)


def test_kmer_set_write_byte_identical():
    d = DATA / "kset_k25"
    base = str(d / "graph")
    import struct

    hdr = RF._read_bytes(FAC, base + ".header")
    _v, k, _count = struct.unpack_from("<QQQ", hdr, 0)
    lo, hi = RF.read_sparse_array(FAC, base + ".kmers")

    out = StringFileFactory()
    write_reference_kmer_set(out, "graph", int(k), lo, hi)
    names = [".header", ".kmers.header", ".kmers.high-bits",
             ".kmers-d0", ".kmers-d1"] + _low_bits_files(d, ".kmers.low-bits")
    _compare(base, out, "graph", names)


def test_upgrade_graph_to_reference_cli():
    """goss upgrade-graph --format reference: the converted artifact
    reads back (auto-detected) with identical content."""
    from gossamer_tpu.cli.goss import main as goss_main
    from gossamer_tpu.graph.graph import Graph

    rng = np.random.default_rng(9)
    k = 11
    lo = np.unique(rng.integers(0, 1 << (2 * k + 2), 500, dtype=np.uint64))
    counts = rng.integers(1, 300, len(lo)).astype(np.int64)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        fac = PhysicalFileFactory()
        base = os.path.join(d, "g")
        Graph(k, lo, np.zeros_like(lo), counts).write(base, fac)
        rc = goss_main(["upgrade-graph", "-G", base, "--format",
                        "reference"])
        assert not rc
        assert fac.exists(base + "-edges.high-bits")
        g = Graph.read(base, fac)  # binary header -> reference branch
        assert np.array_equal(np.asarray(g.lo), lo)
        assert np.array_equal(np.asarray(g.counts), counts)


def test_round_trip_through_reader():
    """Writer output must also round-trip through our own readers."""
    rng = np.random.default_rng(5)
    k = 13
    lo = np.unique(rng.integers(0, 1 << (2 * k + 2), 5000,
                                dtype=np.uint64))
    counts = rng.integers(1, 1 << 20, len(lo)).astype(np.int64)
    out = StringFileFactory()
    write_reference_graph(out, "g", k, lo, np.zeros_like(lo), counts)
    glo, ghi = RF.read_sparse_array(out, "g-edges")
    gc = RF.read_variable_byte_array(out, "g-counts")[: len(glo)]
    assert np.array_equal(glo, lo)
    assert np.array_equal(gc, counts)
