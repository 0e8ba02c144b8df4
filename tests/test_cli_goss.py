"""End-to-end goss CLI tests (hermetic, tmp dirs, CPU backend)."""

import random

import numpy as np
import pytest

from gossamer_tpu.cli.goss import build_app

from specmodel import py_revcomp, spectrum_build_graph, spectrum_kmer_set, py_decode, py_encode


def run(args):
    rc = build_app().main(args)
    assert rc == 0, f"command failed: {args}"


def rand_genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def reads_from(genome, rng, n, length):
    out = []
    for _ in range(n):
        p = rng.randrange(0, len(genome) - length)
        r = genome[p : p + length]
        if rng.random() < 0.5:
            r = "".join("TGCA"["ACGT".index(c)] for c in reversed(r))
        out.append(r)
    return out


@pytest.fixture
def tiny(tmp_path):
    rng = random.Random(42)
    genome = rand_genome(rng, 400)
    reads = reads_from(genome, rng, 60, 60)
    fa = tmp_path / "reads.fa"
    fa.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))
    return tmp_path, genome, reads, str(fa)


def test_build_dump_restore_graph(tiny):
    tmp, genome, reads, fa = tiny
    g = str(tmp / "g")
    run(["build-graph", "-k", "11", "-I", fa, "-O", g, "--chunk-size", "4096"])
    run(["lint-graph", "-G", g])
    dump = tmp / "dump.txt"
    run(["dump-graph", "-G", g, "-o", str(dump)])
    lines = dump.read_text().splitlines()
    assert lines[0] == "#2011101014"
    k, count, flags = lines[1].split("\t")
    assert (k, flags) == ("11", "0")
    got = {}
    for line in lines[2:]:
        seq, c = line.split("\t")
        got[py_encode(seq)] = int(c)
    want = spectrum_build_graph(reads, 12)
    assert got == want
    # ascending order
    keys = [py_encode(line.split("\t")[0]) for line in lines[2:]]
    assert keys == sorted(keys)

    # restore round trip
    g2 = str(tmp / "g2")
    run(["restore-graph", "-f", str(dump), "-O", g2])
    dump2 = tmp / "dump2.txt"
    run(["dump-graph", "-G", g2, "-o", str(dump2)])
    assert dump.read_text() == dump2.read_text()


def test_build_graph_num_devices_parity(tiny):
    """goss build-graph --num-devices 8 (sharded engine over the virtual
    mesh) must produce a byte-identical dump-graph vs the single-device
    run — the CLI exercises the exact path dryrun_multichip validates."""
    tmp, genome, reads, fa = tiny
    g1, g8 = str(tmp / "g1"), str(tmp / "g8")
    run(["build-graph", "-k", "11", "-I", fa, "-O", g1,
         "--chunk-size", "1024"])
    run(["build-graph", "-k", "11", "-I", fa, "-O", g8,
         "--chunk-size", "1024", "--num-devices", "8"])
    d1, d8 = tmp / "d1.txt", tmp / "d8.txt"
    run(["dump-graph", "-G", g1, "-o", str(d1)])
    run(["dump-graph", "-G", g8, "-o", str(d8)])
    assert d1.read_text() == d8.read_text()


def test_build_kmer_set_num_devices_parity(tiny):
    tmp, genome, reads, fa = tiny
    k1, k8 = str(tmp / "k1"), str(tmp / "k8")
    run(["build-kmer-set", "-k", "15", "-I", fa, "-O", k1,
         "--chunk-size", "1024"])
    run(["build-kmer-set", "-k", "15", "-I", fa, "-O", k8,
         "--chunk-size", "1024", "--num-devices", "8"])
    d1, d8 = tmp / "kd1.txt", tmp / "kd8.txt"
    run(["dump-kmer-set", "-G", k1, "-o", str(d1)])
    run(["dump-kmer-set", "-G", k8, "-o", str(d8)])
    assert d1.read_text() == d8.read_text()


def test_build_dump_kmer_set(tiny):
    tmp, genome, reads, fa = tiny
    ks = str(tmp / "ks")
    run(["build-kmer-set", "-k", "15", "-I", fa, "-O", ks, "--chunk-size", "4096"])
    out = tmp / "kset.txt"
    run(["dump-kmer-set", "-G", ks, "-o", str(out)])
    lines = out.read_text().splitlines()
    assert lines[0] == "#2011101701"
    k, count = lines[1].split("\t")
    assert k == "15"
    got = {py_encode(s) for s in lines[2:]}
    assert len(got) == int(count)
    assert got == spectrum_kmer_set(reads, 15)


def test_print_contigs_single_sequence(tmp_path):
    # a genome with unique k-mers gives exactly one contig = the genome
    rng = random.Random(7)
    genome = rand_genome(rng, 300)
    k = 15
    # ensure no repeated k-mers or rc collisions for a clean single chain
    from specmodel import read_kmers, py_normalize

    norm = [py_normalize(v, k) for v in read_kmers(genome, k)]
    if len(set(norm)) != len(norm):
        pytest.skip("random genome has repeats; adjust seed")
    fa = tmp_path / "g.fa"
    fa.write_text(f">chr\n{genome}\n")
    g = str(tmp_path / "g")
    run(["build-graph", "-k", str(k), "-I", str(fa), "-O", g, "--chunk-size", "4096"])
    out = tmp_path / "contigs.fa"
    run(["print-contigs", "-G", g, "-o", str(out)])
    txt = out.read_text().splitlines()
    assert txt[0] == ">1"
    seq = "".join(txt[1:])
    rc = "".join("TGCA"["ACGT".index(c)] for c in reversed(genome))
    assert seq in (genome, rc)
    assert all(len(line) <= 60 for line in txt[1:])


def test_print_contigs_min_length_filters(tmp_path):
    rng = random.Random(3)
    genome = rand_genome(rng, 200)
    fa = tmp_path / "g.fa"
    fa.write_text(f">c\n{genome}\n")
    g = str(tmp_path / "g")
    run(["build-graph", "-k", "15", "-I", str(fa), "-O", g, "--chunk-size", "4096"])
    out = tmp_path / "none.fa"
    run(["print-contigs", "-G", g, "-o", str(out), "--min-length", "100000"])
    assert out.read_text() == ""


def test_graph_to_kmer_set(tiny):
    tmp, genome, reads, fa = tiny
    g = str(tmp / "g")
    run(["build-graph", "-k", "11", "-I", fa, "-O", g, "--chunk-size", "4096"])
    ks = str(tmp / "ks")
    run(["graph-to-kmer-set", "-G", g, "-O", ks])
    out = tmp / "ks.txt"
    run(["dump-kmer-set", "-G", ks, "-o", str(out)])
    lines = out.read_text().splitlines()
    got = {py_encode(s) for s in lines[2:]}
    want = {py_normalize_12(v) for v in spectrum_build_graph(reads, 12)}
    assert got == want


def py_normalize_12(v):
    from specmodel import py_normalize

    return py_normalize(v, 12)
