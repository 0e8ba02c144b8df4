"""electus index + classify tests."""

import random

from gossamer_tpu.cli.electus import build_app


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_electus_end_to_end(tmp_path):
    rng = random.Random(21)
    refs = [rand_seq(rng, 300) for _ in range(3)]
    for i, s in enumerate(refs):
        (tmp_path / f"ref{i}.fa").write_text(f">ref{i}\n{s}\n")

    reads = []
    want = []
    for i, s in enumerate(refs):
        reads.append(s[50:110])
        want.append(True)
    for _ in range(3):
        reads.append(rand_seq(rng, 60))
        want.append(False)
    (tmp_path / "reads.fa").write_text(
        "".join(f">r{i}\n{s}\n" for i, s in enumerate(reads))
    )

    app = build_app()
    pfx = str(tmp_path / "idx")
    args = ["index", "-K", "15", "-P", pfx]
    for i in range(3):
        args += ["-I", str(tmp_path / f"ref{i}.fa")]
    assert app.main(args) == 0

    m = str(tmp_path / "m")
    n = str(tmp_path / "n")
    assert app.main([
        "classify", "-P", pfx, "-I", str(tmp_path / "reads.fa"),
        "--match-prefix", m, "--non-match-prefix", n,
    ]) == 0

    matched = (tmp_path / "m.fasta").read_text()
    nonmatched = (tmp_path / "n.fasta").read_text()
    for i, w in enumerate(want):
        if w:
            assert f">r{i}\n" in matched
            assert f">r{i}\n" not in nonmatched
        else:
            assert f">r{i}\n" in nonmatched

    # threshold 2: single-reference reads no longer match
    assert app.main([
        "classify", "-P", pfx, "-I", str(tmp_path / "reads.fa"),
        "--ref-threshold", "2",
        "--match-prefix", m + "2", "--non-match-prefix", n + "2",
    ]) == 0
    assert ">r0\n" in (tmp_path / "n2.fasta").read_text()
