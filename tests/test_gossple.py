"""gossple end-to-end pipeline test (the reference's canonical workload,
SURVEY.md §3.5)."""

import os
import random

from gossamer_tpu.cli.gossple import main as gossple_main


def rc(s):
    return "".join("TGCA"["ACGT".index(c)] for c in reversed(s))


def test_gossple_paired_assembly(tmp_path, monkeypatch):
    rng = random.Random(55)
    genome = "".join(rng.choice("ACGT") for _ in range(3000))
    insert = 200
    rlen = 70
    lhs_path = tmp_path / "r1.fastq"
    rhs_path = tmp_path / "r2.fastq"
    with open(lhs_path, "w") as f1, open(rhs_path, "w") as f2:
        for i in range(600):
            p = rng.randrange(0, len(genome) - insert)
            frag = genome[p : p + insert]
            r1 = frag[:rlen]
            r2 = rc(frag[-rlen:])
            f1.write(f"@p{i}/1\n{r1}\n+\n{'I' * rlen}\n")
            f2.write(f"@p{i}/2\n{r2}\n+\n{'I' * rlen}\n")

    monkeypatch.chdir(tmp_path)
    rcode = gossple_main([
        "-k", "15", "-O", "asm",
        "-p", str(lhs_path), str(rhs_path),
        "--min-link-count", "3",
    ])
    assert rcode == 0
    contigs_file = tmp_path / "asm-contigs.fa"
    assert contigs_file.exists()
    chunks = [c for c in contigs_file.read_text().split(">") if c]
    assert chunks, "no contigs produced"
    seqs = ["".join(c.splitlines()[1:]) for c in chunks]
    total = sum(len(s) for s in seqs)
    # assembled contigs must cover most of the genome and be real substrings
    grc = rc(genome)
    for s in seqs:
        assert ("N" in s) or s in genome or s in grc, "contig not from genome"
    covered = sum(len(s) for s in seqs if s in genome or s in grc)
    assert covered > 0.7 * len(genome)


def test_gossple_dry_run(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "x.fa").write_text(">a\nACGT\n")
    rcode = gossple_main(["-I", "x.fa", "--dry-run", "-O", "z"])
    assert rcode == 0
