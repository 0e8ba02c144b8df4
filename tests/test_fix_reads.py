"""fix-reads: variable-k anchoring + clustering + fragment assembly.

The decisive case from VERDICT r2: a correlated error burst that
single-base greedy substitution cannot repair — the real algorithm
anchors on both sides of the burst and replaces the whole stretch from
the graph path (``GossCmdFixReads.cc:556-1276``)."""

import random

import numpy as np
import pytest

from gossamer_tpu.algo.fix_reads import FixReadsEngine, _match_len
from gossamer_tpu.graph.build import build_graph
from gossamer_tpu.io.readers import Read


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


@pytest.fixture
def genome_graph():
    rng = random.Random(3)
    k = 15
    while True:
        genome = rand_seq(rng, 400)
        kmers = [genome[i : i + k + 1] for i in range(len(genome) - k)]

        def rc(s):
            return "".join("TGCA"["ACGT".index(c)] for c in reversed(s))

        allk = kmers + [rc(x) for x in kmers]
        if len(set(allk)) == len(allk):  # one clean linear chain
            break
    g = build_graph([Read(b"g", genome.encode())], k, chunk=4096)
    return genome, g


def corrupt(seq: str, pos: int, n: int, rng) -> str:
    out = list(seq)
    for i in range(pos, pos + n):
        out[i] = rng.choice([c for c in "ACGT" if c != out[i]])
    return "".join(out)


def test_correlated_burst_corrected(genome_graph):
    """Three consecutive errors mid-read: greedy single-base repair
    fails (each substitution alone never re-enters the graph), the
    anchor-and-fill algorithm restores the original bases."""
    genome, g = genome_graph
    rng = random.Random(9)
    true_read = genome[100:200]
    bad = corrupt(true_read, 48, 3, rng)
    assert bad != true_read
    eng = FixReadsEngine(g)
    fixed, n_comps, n_juncs, segs = eng.fix_read(bad.encode())
    assert n_comps >= 1
    assert fixed.upper() == true_read, (
        f"burst not corrected: {fixed}")


def test_clean_read_roundtrip(genome_graph):
    genome, g = genome_graph
    eng = FixReadsEngine(g)
    read = genome[50:150]
    fixed, n_comps, _j, _s = eng.fix_read(read.encode())
    assert n_comps >= 1
    assert fixed.upper() == read


def test_garbage_read_untouched(genome_graph):
    """A read with no anchors comes back lowercase and unmodified
    (``GossCmdFixReads.cc:813-826``)."""
    _genome, g = genome_graph
    rng = random.Random(77)
    junk = rand_seq(rng, 80)
    eng = FixReadsEngine(g)
    fixed, n_comps, _j, _s = eng.fix_read(junk.encode())
    if n_comps == 0:
        assert fixed == junk.lower()


def test_two_error_bursts(genome_graph):
    """Two separated bursts are both repaired via chained hits on the
    same segment."""
    genome, g = genome_graph
    rng = random.Random(13)
    true_read = genome[120:240]
    bad = corrupt(corrupt(true_read, 30, 2, rng), 80, 3, rng)
    eng = FixReadsEngine(g)
    fixed, n_comps, _j, _s = eng.fix_read(bad.encode())
    assert fixed.upper() == true_read


def test_match_len_scoring():
    assert _match_len("ACGT", "ACGT") == 4
    assert _match_len("ACGTTTTT", "ACGT") >= 4
    assert _match_len("", "ACGT") == 0


def test_cli_fix_reads(genome_graph, tmp_path):
    genome, g = genome_graph
    from gossamer_tpu.cli.goss import build_app
    from gossamer_tpu.io.factory import PhysicalFileFactory

    g.write(str(tmp_path / "g"), PhysicalFileFactory())
    rng = random.Random(5)
    bad = corrupt(genome[60:160], 50, 3, rng)
    fa = tmp_path / "reads.fa"
    fa.write_text(f">r0\n{bad}\n")
    out = tmp_path / "fixed.fa"
    rc_ = build_app().main(["fix-reads", "-G", str(tmp_path / "g"),
                            "-I", str(fa), "-o", str(out)])
    assert rc_ == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith(">r0 ")
    assert lines[1].upper() == genome[60:160]
