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


def test_device_masks_match_host():
    """read_masks_device (sort-join pairs engine) == read_masks
    (host searchsorted) for 5 refs incl. an odd tail ref."""
    import numpy as np

    from gossamer_tpu.classify.electus import (RefMaskSet, read_masks,
                                               read_masks_device)
    from gossamer_tpu.core import kmer as K
    from gossamer_tpu.graph.kmer_set import KmerSet
    from gossamer_tpu.ops.count import count_chunks

    rng = np.random.default_rng(17)
    k = 15
    sets = []
    genomes = []
    for _ in range(5):
        g = rng.integers(0, 4, 3000, dtype=np.uint8)
        genomes.append(g)
        lo, hi, _ = count_chunks(iter([g]), k, both_strands=False,
                                 canonical=True, chunk=len(g) - k + 1)
        sets.append(KmerSet(k, lo, hi))
    refs = RefMaskSet.build(sets)
    reads = []
    for i in range(300):
        g = genomes[i % 5]
        s = int(rng.integers(0, len(g) - 60))
        reads.append(g[s : s + 60].copy())
    reads.append(rng.integers(0, 4, 60, dtype=np.uint8))  # random read
    want = read_masks(reads, refs)
    got = read_masks_device(reads, refs)
    assert np.array_equal(got, want)
    assert want.max() > 0
