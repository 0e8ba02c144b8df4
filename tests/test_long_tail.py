"""Long-tail goss commands: extract/filter reads, subgraph, variants,
fix-reads, taxonomy classify, dot output, build-db."""

import random
import sqlite3

from gossamer_tpu.cli.goss import build_app

from specmodel import py_encode


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def rc(s):
    return "".join("TGCA"["ACGT".index(c)] for c in reversed(s))


def run(args):
    assert build_app().main(args) == 0, args


def test_extract_and_filter_reads(tmp_path):
    rng = random.Random(61)
    genome = rand_seq(rng, 400)
    (tmp_path / "g.fa").write_text(f">g\n{genome}\n")
    gfile = str(tmp_path / "g")
    run(["build-graph", "-k", "15", "-I", str(tmp_path / "g.fa"), "-O", gfile,
         "--chunk-size", "4096"])
    reads = [genome[50:110], rand_seq(rng, 60), genome[200:260], rand_seq(rng, 60)]
    (tmp_path / "r.fa").write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    out = tmp_path / "m.fa"
    run(["extract-reads", "-G", gfile, "-I", str(tmp_path / "r.fa"), "-o", str(out)])
    txt = out.read_text()
    assert ">r0" in txt and ">r2" in txt
    assert ">r1" not in txt and ">r3" not in txt

    # filter-reads against the canonical kmer set
    ks = str(tmp_path / "ks")
    run(["build-kmer-set", "-k", "15", "-I", str(tmp_path / "g.fa"), "-O", ks,
         "--chunk-size", "4096"])
    mf, nf = str(tmp_path / "mf.fa"), str(tmp_path / "nf.fa")
    run(["filter-reads", "-G", ks, "-I", str(tmp_path / "r.fa"),
         "--match-file", mf, "--non-match-file", nf])
    assert ">r0" in open(mf).read()
    assert ">r1" in open(nf).read()


def test_build_subgraph_and_variants(tmp_path):
    rng = random.Random(62)
    genome = rand_seq(rng, 300)
    variant = genome[:100] + ("A" if genome[100] != "A" else "C") + genome[101:]
    (tmp_path / "ref.fa").write_text(f">r\n{genome}\n")
    (tmp_path / "tgt.fa").write_text(f">t\n{variant}\n")
    ref, tgt = str(tmp_path / "ref"), str(tmp_path / "tgt")
    run(["build-graph", "-k", "15", "-I", str(tmp_path / "ref.fa"), "-O", ref,
         "--chunk-size", "4096"])
    run(["build-graph", "-k", "15", "-I", str(tmp_path / "tgt.fa"), "-O", tgt,
         "--chunk-size", "4096"])
    vout = tmp_path / "vars.txt"
    run(["detect-variants", "--graph-ref", ref, "--graph-target", tgt,
         "-o", str(vout)])
    lines = [l for l in vout.read_text().splitlines() if l]
    assert lines, "expected variant edges"

    # subgraph seeded by a piece of the genome
    (tmp_path / "seed.fa").write_text(f">s\n{genome[50:80]}\n")
    sub = str(tmp_path / "sub")
    run(["build-subgraph", "-G", ref, "-I", str(tmp_path / "seed.fa"),
         "-O", sub, "--radius", "2"])
    run(["lint-graph", "-G", sub])


def test_fix_reads(tmp_path):
    rng = random.Random(63)
    genome = rand_seq(rng, 500)
    (tmp_path / "g.fa").write_text(f">g\n{genome}\n" * 1)
    gfile = str(tmp_path / "g")
    run(["build-graph", "-k", "15", "-I", str(tmp_path / "g.fa"), "-O", gfile,
         "--chunk-size", "4096"])
    # read with one error in the middle
    read = genome[100:180]
    bad = read[:40] + ("A" if read[40] != "A" else "C") + read[41:]
    (tmp_path / "r.fa").write_text(f">x\n{bad}\n")
    out = tmp_path / "fixed.fa"
    run(["fix-reads", "-G", gfile, "-I", str(tmp_path / "r.fa"), "-o", str(out)])
    fixed = "".join(out.read_text().splitlines()[1:])
    assert fixed == read, "single error should be corrected"


def test_dot_and_db(tmp_path):
    rng = random.Random(64)
    genome = rand_seq(rng, 200)
    (tmp_path / "g.fa").write_text(f">g\n{genome}\n")
    gfile = str(tmp_path / "g")
    run(["build-graph", "-k", "13", "-I", str(tmp_path / "g.fa"), "-O", gfile,
         "--chunk-size", "4096"])
    dot = tmp_path / "g.dot"
    run(["dot-graph", "-G", gfile, "-o", str(dot), "--label-edges"])
    assert dot.read_text().startswith("digraph G {")
    run(["build-entry-edge-set", "-G", gfile])
    run(["build-supergraph", "-G", gfile])
    db = tmp_path / "g.db"
    run(["build-db", "-G", gfile, "-o", str(db)])
    con = sqlite3.connect(db)
    n = con.execute("SELECT COUNT(*) FROM nodes").fetchone()[0]
    s = con.execute("SELECT sequence FROM sequences LIMIT 1").fetchone()[0]
    assert n >= 1 and len(s) > 50


def test_taxonomy_classify(tmp_path):
    rng = random.Random(65)
    sp1 = rand_seq(rng, 300)
    sp2 = rand_seq(rng, 300)
    (tmp_path / "sp1.fa").write_text(f">a\n{sp1}\n")
    (tmp_path / "sp2.fa").write_text(f">b\n{sp2}\n")
    (tmp_path / "both.fa").write_text(f">a\n{sp1}\n>b\n{sp2}\n")
    # taxonomy: root(1) -> genus(2) -> species 3,4
    (tmp_path / "taxo.tsv").write_text(
        "1\t1\troot\troot\n2\t1\tgenus\tG\n3\t2\tspecies\tS1\n4\t2\tspecies\tS2\n"
    )
    (tmp_path / "annots.tsv").write_text(
        f"{tmp_path}/sp1.fa\t3\n{tmp_path}/sp2.fa\t4\n"
    )
    ks = str(tmp_path / "ks")
    run(["build-kmer-set", "-k", "15", "-I", str(tmp_path / "both.fa"),
         "-O", ks, "--chunk-size", "4096"])
    run(["annotate-kmers", "-G", ks, "--annot-list", str(tmp_path / "annots.tsv"),
         "--taxonomy", str(tmp_path / "taxo.tsv")])
    reads = [sp1[50:110], sp2[50:110], sp1[0:60]]
    (tmp_path / "r.fa").write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run(["classify-reads", "-G", ks, "-I", str(tmp_path / "r.fa")])
    out = buf.getvalue()
    assert "S1" in out and "S2" in out
    # S1 gets 2 reads, S2 gets 1
    for line in out.splitlines():
        if "\tS1" in line:
            assert line.startswith("2\t")
        if "\tS2" in line:
            assert line.startswith("1\t")
