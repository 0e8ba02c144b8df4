"""translucent + espresso app tests."""

import random

import numpy as np

from gossamer_tpu.cli.espresso import build_app as espresso_app
from gossamer_tpu.cli.translucent import build_app as translucent_app

from specmodel import spectrum_kmer_set


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_translucent_pipeline(tmp_path):
    rng = random.Random(71)
    # two "transcripts"
    t1 = rand_seq(rng, 400)
    t2 = rand_seq(rng, 300)
    reads = []
    for t in (t1, t2):
        for _ in range(30):
            p = rng.randrange(0, len(t) - 60)
            reads.append(t[p : p + 60])
    (tmp_path / "r.fa").write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    app = translucent_app()
    g = str(tmp_path / "t")
    assert app.main(["build-graph", "-k", "15", "-I", str(tmp_path / "r.fa"),
                     "-O", g, "--chunk-size", "8192"]) == 0
    assert app.main(["trim-relative", "-G", g, "-O", g,
                     "--relative-cutoff", "0.05"]) == 0
    out = tmp_path / "tx.fa"
    assert app.main(["assemble", "-G", g, "-I", str(tmp_path / "r.fa"),
                     "-o", str(out), "--min-length", "100"]) == 0
    txt = out.read_text()
    seqs = ["".join(c.splitlines()[1:]) for c in txt.split(">") if c]
    assert len(seqs) >= 2
    rc = lambda s: "".join("TGCA"["ACGT".index(c)] for c in reversed(s))
    joined = [t1, rc(t1), t2, rc(t2)]
    for s in seqs:
        assert any(s in t for t in joined)


def test_translucent_merge_reference(tmp_path):
    rng = random.Random(72)
    genome = rand_seq(rng, 300)
    sub = genome[:150]
    (tmp_path / "full.fa").write_text(f">g\n{genome}\n")
    (tmp_path / "sub.fa").write_text(f">s\n{sub}\n")
    app = translucent_app()
    gf, gs = str(tmp_path / "full"), str(tmp_path / "sub")
    assert app.main(["build-graph", "-k", "13", "-I", str(tmp_path / "full.fa"),
                     "-O", gf, "--chunk-size", "4096"]) == 0
    assert app.main(["build-graph", "-k", "13", "-I", str(tmp_path / "sub.fa"),
                     "-O", gs, "--chunk-size", "4096"]) == 0
    out = str(tmp_path / "merged")
    assert app.main(["merge-graph-with-reference", "-G", gs,
                     "--graph-ref", gf, "-O", out]) == 0
    from gossamer_tpu.graph.graph import Graph
    from gossamer_tpu.io.factory import PhysicalFileFactory

    m = Graph.read(out, PhysicalFileFactory())
    s = Graph.read(gs, PhysicalFileFactory())
    assert m.count == s.count  # sub is entirely inside full


def test_espresso_dense_and_similarity(tmp_path):
    rng = random.Random(73)
    s1 = rand_seq(rng, 500)
    s2 = rand_seq(rng, 500)
    (tmp_path / "s1.fa").write_text(f">a\n{s1}\n")
    (tmp_path / "s2.fa").write_text(f">b\n{s2}\n")
    app = espresso_app()
    m1 = str(tmp_path / "m1.mat")
    m2 = str(tmp_path / "m2.mat")
    assert app.main(["single", "-k", "7", "-S", "s1", "-I",
                     str(tmp_path / "s1.fa"), "-o", m1]) == 0
    assert app.main(["single", "-k", "7", "-S", "s2", "-I",
                     str(tmp_path / "s2.fa"), "-o", m2]) == 0
    from scipy.io import loadmat

    v = loadmat(m1)["s1"]
    k = 7
    want_total = len(spectrum_kmer_set([s1], k))  # distinct canonical
    assert int((v > 0).sum()) == want_total
    assert int(v.sum()) == len(s1) - k + 1
    sim = tmp_path / "sim.txt"
    assert app.main(["similarity", "--matrices", m1, "--matrices", m2,
                     "-o", str(sim)]) == 0
    line = sim.read_text().strip()
    assert float(line.split("\t")[2]) < 0.9  # different random genomes


def test_espresso_sparse_and_query(tmp_path):
    rng = random.Random(74)
    ref = rand_seq(rng, 300)
    (tmp_path / "ref.fa").write_text(f">r\n{ref}\n")
    from gossamer_tpu.cli.goss import build_app as goss_app

    ks = str(tmp_path / "ks")
    assert goss_app().main(["build-kmer-set", "-k", "15", "-I",
                            str(tmp_path / "ref.fa"), "-O", ks,
                            "--chunk-size", "4096"]) == 0
    app = espresso_app()
    m = str(tmp_path / "sp.mat")
    assert app.main(["sparse-single", "-G", ks, "-S", "x",
                     "-I", str(tmp_path / "ref.fa"), "-o", m]) == 0
    from scipy.io import loadmat

    v = loadmat(m)["x"]
    assert int(v.sum()) == len(ref) - 15 + 1
