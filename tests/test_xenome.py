"""xenome index + classify end-to-end and set-op tests."""

import random

import numpy as np
import pytest

from gossamer_tpu.classify.annotated_set import (
    compute_near_kmers,
    intersect_sets,
    merge_and_annotate,
    merge_sets,
    subtract_sets,
)
from gossamer_tpu.classify.xenome import classify_reads
from gossamer_tpu.cli.xenome import build_app
from gossamer_tpu.graph.build import build_kmer_set
from gossamer_tpu.io.readers import Read

from specmodel import py_normalize, read_kmers, spectrum_kmer_set


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mk_reads(seqs):
    return [Read(str(i), s.encode()) for i, s in enumerate(seqs)]


K = 15


@pytest.fixture(scope="module")
def genomes():
    rng = random.Random(77)
    shared = rand_seq(rng, 120)
    graft = rand_seq(rng, 400) + shared
    host = rand_seq(rng, 400) + shared
    return graft, host, shared


def test_set_ops(genomes):
    graft, host, shared = genomes
    a, _ = build_kmer_set(mk_reads([graft]), K, chunk=4096)
    b, _ = build_kmer_set(mk_reads([host]), K, chunk=4096)
    u = merge_sets([a, b])
    i = intersect_sets(a, b)
    d = subtract_sets(a, b)
    sa = spectrum_kmer_set([graft], K)
    sb = spectrum_kmer_set([host], K)

    def as_set(ks):
        return {(int(h) << 64) | int(l) for l, h in zip(ks.lo, ks.hi)}

    assert as_set(u) == sa | sb
    assert as_set(i) == sa & sb
    assert as_set(d) == sa - sb


def test_merge_and_annotate_bits(genomes):
    graft, host, _ = genomes
    a, _ = build_kmer_set(mk_reads([graft]), K, chunk=4096)
    b, _ = build_kmer_set(mk_reads([host]), K, chunk=4096)
    ann, common = merge_and_annotate(a, b)
    sa = spectrum_kmer_set([graft], K)
    sb = spectrum_kmer_set([host], K)
    assert common == len(sa & sb)
    for j in range(ann.kset.count):
        v = (int(ann.kset.hi[j]) << 64) | int(ann.kset.lo[j])
        assert ann.lhs[j] == (v in sa)
        assert ann.rhs[j] == (v in sb)


def brute_blrg(seq, ann):
    sset = {}
    for j in range(ann.kset.count):
        v = (int(ann.kset.hi[j]) << 64) | int(ann.kset.lo[j])
        sset[v] = (bool(ann.lhs[j]) << 1) | bool(ann.rhs[j])
    blrg = 0
    for v in read_kmers(seq, ann.kset.k):
        nv = py_normalize(v, ann.kset.k)
        if nv in sset:
            blrg |= 1 << sset[nv]
    return blrg


def test_classify_blrg_matches_brute_force(genomes):
    graft, host, shared = genomes
    rng = random.Random(5)
    a, _ = build_kmer_set(mk_reads([graft]), K, chunk=4096)
    b, _ = build_kmer_set(mk_reads([host]), K, chunk=4096)
    ann, _ = merge_and_annotate(a, b)
    compute_near_kmers(ann)

    reads = []
    for _ in range(10):
        p = rng.randrange(0, len(graft) - 60)
        reads.append(graft[p : p + 60])
        p = rng.randrange(0, len(host) - 60)
        reads.append(host[p : p + 60])
        reads.append(rand_seq(rng, 60))
    reads.append(shared[10:70])

    got = {r.label: blrg for r, blrg in classify_reads(mk_reads(reads), ann)}
    for i, s in enumerate(reads):
        assert got[str(i)] == brute_blrg(s, ann), f"read {i}"


def test_xenome_cli_end_to_end(tmp_path, genomes):
    graft, host, shared = genomes
    rng = random.Random(9)
    (tmp_path / "graft.fa").write_text(f">g\n{graft}\n")
    (tmp_path / "host.fa").write_text(f">h\n{host}\n")
    # reads: 5 graft-only, 5 host-only, 3 shared, 2 random
    reads = []
    classes = []
    for _ in range(5):
        p = rng.randrange(0, 300 - 60)
        reads.append(graft[p : p + 60])
        classes.append("graft")
    for _ in range(5):
        p = rng.randrange(0, 300 - 60)
        reads.append(host[p : p + 60])
        classes.append("host")
    for _ in range(3):
        reads.append(shared[20:90])
        classes.append("both")
    for _ in range(2):
        reads.append(rand_seq(rng, 60))
        classes.append("neither")
    (tmp_path / "reads.fq").write_text(
        "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(reads))
    )

    app = build_app()
    pfx = str(tmp_path / "idx")
    assert app.main(["index", "-K", str(K), "-G", str(tmp_path / "graft.fa"),
                     "-H", str(tmp_path / "host.fa"), "-P", pfx]) == 0
    out_pfx = str(tmp_path / "out")
    assert app.main(["classify", "-P", pfx, "-i", str(tmp_path / "reads.fq"),
                     "--output-filename-prefix", out_pfx]) == 0

    def read_ids(cls):
        f = tmp_path / f"out_{cls}.fastq"
        if not f.exists():
            return set()
        return {line[1:].strip() for line in f.read_text().splitlines()
                if line.startswith("@r")}

    got_g = read_ids("graft")
    got_h = read_ids("host")
    got_b = read_ids("both")
    for i, cls in enumerate(classes):
        rid = f"r{i}"
        if cls == "graft":
            assert rid in got_g, f"{rid} should be graft"
        elif cls == "host":
            assert rid in got_h, f"{rid} should be host"
        elif cls == "both":
            assert rid in got_b, f"{rid} should be both"


def test_xenome_cli_num_devices_parity(tmp_path, genomes):
    """xenome classify --num-devices 8 (index sharded over the virtual
    mesh) produces byte-identical class files."""
    graft, host, shared = genomes
    rng = random.Random(3)
    (tmp_path / "graft.fa").write_text(f">g\n{graft}\n")
    (tmp_path / "host.fa").write_text(f">h\n{host}\n")
    reads = [graft[p : p + 60] for p in range(0, 200, 13)]
    reads += [host[p : p + 60] for p in range(0, 200, 17)]
    reads += [rand_seq(rng, 60) for _ in range(4)]
    (tmp_path / "reads.fq").write_text(
        "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n"
                for i, s in enumerate(reads)))
    app = build_app()
    pfx = str(tmp_path / "idx")
    assert app.main(["index", "-K", str(K), "-G", str(tmp_path / "graft.fa"),
                     "-H", str(tmp_path / "host.fa"), "-P", pfx]) == 0
    for tag, extra in (("one", []), ("mesh", ["--num-devices", "8"])):
        assert app.main(["classify", "-P", pfx,
                         "-i", str(tmp_path / "reads.fq"),
                         "--output-filename-prefix",
                         str(tmp_path / tag)] + extra) == 0
    for cls in ("graft", "host", "both", "neither", "ambiguous"):
        a = tmp_path / f"one_{cls}.fastq"
        b = tmp_path / f"mesh_{cls}.fastq"
        assert a.exists() == b.exists()
        if a.exists():
            assert a.read_text() == b.read_text(), cls
