"""Generate thread-reads gold-parity fixtures from the REFERENCE.

Compiles scripts/baseline/ref_threading.cc — the reference's own
SuperGraph/EdgeIndex/KmerAligner sources driving its thread-reads
pipeline (``/root/reference/src/GossCmdThreadReads.cc:304-1060``) — and
records, per fixture, the dump-graph text + reads + args + the sorted
surviving superpath contig sequences.  tests/test_ref_parity_threading.py
asserts our vectorized thread-reads makes the identical joins.

Usage: python scripts/make_ref_threading_fixtures.py
"""

import os
import random
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "data", "ref_threading")
TOOL = "/tmp/ref_threading"

REF_SRC = [
    "SuperGraph.cc", "EdgeIndex.cc", "EntryEdgeSet.cc", "Graph.cc",
    "SparseArray.cc", "DenseArray.cc", "WordyBitVector.cc",
    "IntegerArray.cc", "VariableByteArray.cc", "StringFileFactory.cc",
    "FileFactory.cc", "Utils.cc", "Debug.cc", "RRRArray.cc",
    "GossamerException.cc", "BigInteger.cc", "MachDep.cc",
    "VariableWidthBitArray.cc", "SmallBaseVector.cc",
    "MultithreadedBatchTask.cc", "GraphTrimmer.cc",
]


def build_tool():
    base = os.path.join(ROOT, "scripts", "baseline")
    cmd = [
        "g++", "-O2", "-std=c++17", "-pthread", "-DGOSS_PLATFORM_UNIX",
        "-DGOSS_COMPILER_GNU", "-I", os.path.join(base, "boost_shim"),
        "-include", "boost/assert.hpp", "-include", "boost/shared_ptr.hpp",
        "-I", "/root/reference/src",
        os.path.join(base, "ref_threading.cc"),
    ] + [f"/root/reference/src/{f}" for f in REF_SRC] + ["-o", TOOL]
    subprocess.run(cmd, check=True)


def rc(s):
    return "".join("TGCA"["ACGT".index(c)] for c in reversed(s))


def spectrum(reads, k):
    from collections import Counter

    c = Counter()
    for r in reads:
        for i in range(len(r) - k):
            w = r[i : i + k + 1]
            if set(w) <= set("ACGT"):
                c[w] += 1
                c[rc(w)] += 1
    code = {"A": 0, "C": 1, "G": 2, "T": 3}

    def enc(s):
        v = 0
        for ch in s:
            v = (v << 2) | code[ch]
        return v

    keys = sorted(c, key=enc)
    return keys, c


def dump_text(k, keys, counts):
    text = f"#2011101014\n{k}\t{len(keys)}\t0\n"
    text += "".join(f"{s}\t{counts[s]}\n" for s in keys)
    return text


def write_fixture(name, args, k, reads):
    keys, counts = spectrum(reads, k)
    text = dump_text(k, keys, counts)
    stdin = text + "READS\n" + "".join(r + "\n" for r in reads)
    d = os.path.join(OUT, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "input.dump"), "w") as f:
        f.write(text)
    with open(os.path.join(d, "reads.txt"), "w") as f:
        f.write("".join(r + "\n" for r in reads))
    with open(os.path.join(d, "args.txt"), "w") as f:
        f.write(" ".join(args))
    r = subprocess.run([TOOL] + args + ["--dump-supergraph"],
                       input=stdin.encode(),
                       capture_output=True, check=True)
    contigs, sgfiles = [], []
    for line in r.stdout.decode().splitlines():
        (sgfiles if line.startswith("FILE ") else contigs).append(line)
    with open(os.path.join(d, "expected.contigs"), "w") as f:
        f.write("".join(c + "\n" for c in contigs))
    with open(os.path.join(d, "ref.supergraph-files"), "w") as f:
        f.write("".join(s + "\n" for s in sgfiles))
    n_paths = r.stdout.decode().count("\n")
    print(f"{name}: {len(keys)} edges, {len(reads)} reads -> "
          f"{n_paths} superpaths ({' '.join(args)})")


def tile(seq, rlen, step):
    return [seq[p : p + rlen]
            for p in range(0, len(seq) - rlen + 1, step)]


def main():
    build_tool()
    rng = random.Random(171)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    k = 15

    # 1. bowtie: two paths through one shared segment; reads span it
    shared = rand_seq(40)
    a, b, c, d = (rand_seq(80) for _ in range(4))
    seq1, seq2 = a + shared + c, b + shared + d
    reads = tile(seq1, 70, 3) + tile(seq2, 70, 3)
    write_fixture("bowtie", ["--expected-coverage", "20",
                             "--min-link-count", "5"], k, reads)

    # 2. double repeat: A R B R C — joining must thread through R twice
    r1 = rand_seq(35)
    seq = rand_seq(90) + r1 + rand_seq(90) + r1 + rand_seq(90)
    reads = tile(seq, 75, 3)
    write_fixture("double_repeat", ["--expected-coverage", "22",
                                    "--min-link-count", "5"], k, reads)

    # 3. three-way braid: three sequences sharing two repeats
    rA, rB = rand_seq(30), rand_seq(30)
    s1 = rand_seq(70) + rA + rand_seq(70) + rB + rand_seq(70)
    s2 = rand_seq(70) + rA + rand_seq(70)
    s3 = rand_seq(70) + rB + rand_seq(70)
    reads = tile(s1, 65, 3) + tile(s2, 65, 3) + tile(s3, 65, 3)
    write_fixture("braid", ["--expected-coverage", "18",
                            "--min-link-count", "5"], k, reads)

    # 4. low-count links filtered: sparse tiling under the threshold
    shared = rand_seq(40)
    sA, sB = rand_seq(80) + shared + rand_seq(80), None
    reads = tile(sA, 70, 12)  # few spanning reads -> links filtered out
    write_fixture("filtered", ["--expected-coverage", "5",
                               "--min-link-count", "10"], k, reads)

    # 5. gapped link: a non-unique stretch between unique paths makes
    # gap > 0 and exercises findPath's radius/length scoring
    rep = rand_seq(25)
    seq = (rand_seq(85) + rep + rand_seq(18) + rep + rand_seq(85))
    reads = tile(seq, 80, 3)
    write_fixture("gapped", ["--expected-coverage", "25",
                             "--min-link-count", "4"], k, reads)

    # 6. two independent components joined separately
    c1 = rand_seq(60) + rand_seq(40) + rand_seq(60)
    shared2 = rand_seq(40)
    c2 = rand_seq(70) + shared2 + rand_seq(70)
    c3 = rand_seq(70) + shared2 + rand_seq(70)
    reads = tile(c1, 70, 4) + tile(c2, 70, 4) + tile(c3, 70, 4)
    write_fixture("components", ["--expected-coverage", "16",
                                 "--min-link-count", "5"], k, reads)


if __name__ == "__main__":
    main()
