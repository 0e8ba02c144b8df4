"""Regenerate tests/data/ref_cleanup/* gold-parity fixtures.

Builds scripts/baseline/ref_cleanup (the REFERENCE's own TourBus +
GraphTrimmer + the GossCmdPruneTips decision loop, compiled unmodified
against the Boost shims), runs it on synthetic bubble/tip graphs, and
stores (input dump, expected surviving-edge dump) pairs so
tests/test_ref_parity_cleanup.py can assert our vectorized cleanup
makes IDENTICAL trim decisions.

Usage: python scripts/make_ref_cleanup_fixtures.py
"""

import os
import random
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "data", "ref_cleanup")
TOOL = "/tmp/ref_cleanup"

REF_SRC = [
    "TourBus.cc", "GraphTrimmer.cc", "MultithreadedBatchTask.cc",
    "Graph.cc", "SparseArray.cc", "DenseArray.cc", "WordyBitVector.cc",
    "IntegerArray.cc", "VariableByteArray.cc", "StringFileFactory.cc",
    "FileFactory.cc", "Utils.cc", "Debug.cc", "RRRArray.cc",
    "GossamerException.cc", "BigInteger.cc", "MachDep.cc",
    "VariableWidthBitArray.cc", "SmallBaseVector.cc",
    "EntryEdgeSet.cc",
]


def build_tool():
    base = os.path.join(ROOT, "scripts", "baseline")
    cmd = [
        "g++", "-O2", "-std=c++17", "-pthread", "-DGOSS_PLATFORM_UNIX",
        "-DGOSS_COMPILER_GNU", "-I", os.path.join(base, "boost_shim"),
        "-include", "boost/shared_ptr.hpp", "-I", "/root/reference/src",
        os.path.join(base, "ref_cleanup.cc"),
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


def write_fixture(name, mode_args, text):
    d = os.path.join(OUT, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "input.dump"), "w") as f:
        f.write(text)
    with open(os.path.join(d, "args.txt"), "w") as f:
        f.write(" ".join(mode_args))
    r = subprocess.run([TOOL] + mode_args, input=text.encode(),
                       capture_output=True, check=True)
    with open(os.path.join(d, "expected.dump"), "wb") as f:
        f.write(r.stdout)
    n_in = text.count("\n") - 2
    n_out = r.stdout.decode().count("\n")
    print(f"{name}: {n_in} -> {n_out} edges ({' '.join(mode_args)})")


def main():
    build_tool()
    rng = random.Random(42)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    # 1. single SNP bubble, clear majority (30x vs 5x), k=11
    k = 11
    left = rand_seq(40)
    right = rand_seq(40)
    mid_a = rand_seq(9)
    mid_b = mid_a[:4] + ("A" if mid_a[4] != "A" else "C") + mid_a[5:]
    maj = left + mid_a + right
    mnr = left + mid_b + right
    reads = [maj] * 30 + [mnr] * 5
    keys, c = spectrum(reads, k)
    write_fixture("bubble_simple", ["pop-bubbles"], dump_text(k, keys, c))

    # 2. random genome + sequencing errors, k=15: many incidental
    #    bubbles/tips; exercises NCA walks, length/edit gates
    k = 15
    genome = rand_seq(600)
    reads = []
    for _ in range(300):
        p = rng.randrange(0, len(genome) - 60)
        r = list(genome[p : p + 60])
        if rng.random() < 0.4:
            q = rng.randrange(0, 60)
            r[q] = rng.choice("ACGT")
        reads.append("".join(r))
    keys, c = spectrum(reads, k)
    text = dump_text(k, keys, c)
    write_fixture("errors_contigs", ["print-contigs"], text)
    write_fixture("errors_contigs_min", ["print-contigs", "--min-length",
                                         "40"], text)
    write_fixture("errors_pop", ["pop-bubbles"], text)
    write_fixture("errors_pop_cut", ["pop-bubbles", "--relative-cutoff",
                                     "0.5"], text)
    write_fixture("errors_prune", ["prune-tips"], text)
    write_fixture("errors_prune_it2", ["prune-tips", "--iterate", "2"], text)
    write_fixture("errors_entries", ["entry-edges"], text)

    # 3. explicit tips: low-coverage dead ends hanging off a 20x path
    k = 11
    spine = rand_seq(120)
    tip1 = spine[:30] + rand_seq(8)       # forward tip off position 30
    tip2 = rand_seq(8) + spine[60:90]     # backward tip into position 60
    reads = [spine] * 20 + [tip1] * 2 + [tip2] * 2
    keys, c = spectrum(reads, k)
    write_fixture("tips", ["prune-tips"], dump_text(k, keys, c))
    write_fixture("spine_contigs", ["print-contigs"], dump_text(k, keys, c))
    write_fixture("spine_entries", ["entry-edges"], dump_text(k, keys, c))


if __name__ == "__main__":
    main()
