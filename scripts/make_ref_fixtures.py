"""Regenerate tests/data/ref_format/* interop fixtures.

Builds scripts/baseline/make_ref_graph (the reference's own Builders
compiled against the Boost shims) and writes genuine reference-format
artifacts for the interop tests.  Usage:

    python scripts/make_ref_fixtures.py
"""

import os
import random
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "data", "ref_format")
TOOL = "/tmp/make_ref_graph"

REF_SRC = [
    "Graph.cc", "SparseArray.cc", "DenseArray.cc", "WordyBitVector.cc",
    "IntegerArray.cc", "VariableByteArray.cc", "StringFileFactory.cc",
    "FileFactory.cc", "Utils.cc", "Debug.cc", "RRRArray.cc",
    "GossamerException.cc", "BigInteger.cc", "MachDep.cc",
    "VariableWidthBitArray.cc",
]


def build_tool():
    base = os.path.join(ROOT, "scripts", "baseline")
    cmd = [
        "g++", "-O2", "-std=c++17", "-pthread", "-DGOSS_PLATFORM_UNIX",
        "-DGOSS_COMPILER_GNU", "-I", os.path.join(base, "boost_shim"),
        "-include", "boost/shared_ptr.hpp", "-I", "/root/reference/src",
        os.path.join(base, "make_ref_graph.cc"),
    ] + [f"/root/reference/src/{f}" for f in REF_SRC] + ["-o", TOOL]
    subprocess.run(cmd, check=True)


def rc(s):
    return "".join("TGCA"["ACGT".index(c)] for c in reversed(s))


def encode_sorted(kmers):
    return sorted(set(kmers), key=lambda s: int(
        "".join(str("ACGT".index(c)) for c in s), 4))


def write_fixture(name, text, kind=""):
    d = os.path.join(OUT, name)
    os.makedirs(d, exist_ok=True)
    args = [TOOL, d, "graph"] + ([kind] if kind else [])
    subprocess.run(args, input=text.encode(), check=True)


def main():
    build_tool()
    rng = random.Random(42)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    # 1. symmetric k=11 graph from a genome (fwd+rc, realistic counts)
    genome = rand_seq(300)
    k = 11
    from collections import Counter

    c = Counter()
    for i in range(len(genome) - k):
        w = genome[i : i + k + 1]
        c[w] += 1
        c[rc(w)] += 1
    keys = encode_sorted(c)
    text = f"#2011101014\n{k}\t{len(keys)}\t0\n"
    text += "".join(f"{s}\t{c[s]}\n" for s in keys)
    write_fixture("graph_k11", text)

    # 2. asymmetric graph with counts in all three VBA layers
    #    (< 256, >= 256, >= 65536; src/VariableByteArray.hh:80-103)
    kmers = encode_sorted(rand_seq(12) for _ in range(64))
    counts = [rng.randrange(1, 250) for _ in kmers]
    counts[3] = 300
    counts[10] = 70000
    counts[20] = 1 << 24
    text = f"#2011101014\n11\t{len(kmers)}\t1\n"
    text += "".join(f"{s}\t{ct}\n" for s, ct in zip(kmers, counts))
    write_fixture("graph_layers", text)

    # 3. k=25 canonical k-mer set (narrow keys, 50-bit space)
    kset = encode_sorted(rand_seq(25) for _ in range(200))
    text = f"#2011101701\n25\t{len(kset)}\n"
    text += "".join(s + "\n" for s in kset)
    write_fixture("kset_k25", text, kind="kmer-set")

    # 4. wide keys: k=33 graph (68-bit edge space)
    wkeys = encode_sorted(rand_seq(34) for _ in range(100))
    text = f"#2011101014\n33\t{len(wkeys)}\t1\n"
    text += "".join(f"{s}\t{rng.randrange(1, 9)}\n" for s in wkeys)
    write_fixture("graph_k33", text)

    print(f"fixtures written under {OUT}")


if __name__ == "__main__":
    sys.exit(main())
