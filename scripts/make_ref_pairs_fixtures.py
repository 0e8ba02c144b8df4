"""Generate thread-pairs gold-parity fixtures from the REFERENCE.

Compiles scripts/baseline/ref_pairs.cc — the reference's own
SuperGraph/EdgeIndex/PairAligner sources driving its thread-pairs
pipeline (``/root/reference/src/GossCmdThreadPairs.cc:746-1145``) — and
records, per fixture, the dump-graph text + read pairs + args + the
surviving superpaths (contig sequence + segment ranks).
tests/test_ref_parity_pairs.py asserts our vectorized thread-pairs
makes the identical joins.

Usage: python scripts/make_ref_pairs_fixtures.py
"""

import os
import random
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "data", "ref_pairs")
TOOL = "/tmp/ref_pairs"

from make_ref_threading_fixtures import (REF_SRC, dump_text,  # noqa: E402
                                         rc, spectrum)


def build_tool():
    base = os.path.join(ROOT, "scripts", "baseline")
    cmd = [
        "g++", "-O2", "-std=c++17", "-pthread", "-DGOSS_PLATFORM_UNIX",
        "-DGOSS_COMPILER_GNU", "-I", os.path.join(base, "boost_shim"),
        "-include", "boost/assert.hpp", "-include", "boost/shared_ptr.hpp",
        "-I", "/root/reference/src",
        os.path.join(base, "ref_pairs.cc"),
    ] + [f"/root/reference/src/{f}" for f in REF_SRC] + ["-o", TOOL]
    subprocess.run(cmd, check=True)


def write_fixture(name, args, k, cover_reads, pairs):
    keys, counts = spectrum(cover_reads, k)
    text = dump_text(k, keys, counts)
    stdin = (text + "PAIRS\n"
             + "".join(f"{l}\t{r}\n" for l, r in pairs))
    d = os.path.join(OUT, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "input.dump"), "w") as f:
        f.write(text)
    with open(os.path.join(d, "pairs.txt"), "w") as f:
        f.write("".join(f"{l}\t{r}\n" for l, r in pairs))
    with open(os.path.join(d, "args.txt"), "w") as f:
        f.write(" ".join(args))
    r = subprocess.run([TOOL] + args, input=stdin.encode(),
                       capture_output=True, check=True)
    with open(os.path.join(d, "expected.contigs"), "wb") as f:
        f.write(r.stdout)
    n_paths = r.stdout.decode().count("\n")
    print(f"{name}: {len(keys)} edges, {len(pairs)} pairs -> "
          f"{n_paths} superpaths ({' '.join(args)})")


def tile(seq, rlen, step):
    return [seq[p : p + rlen]
            for p in range(0, len(seq) - rlen + 1, step)]


def make_pairs(seq, rlen, insert, step):
    """Paired-end pairs: L forward, R reverse-complemented."""
    out = []
    for p in range(0, len(seq) - insert + 1, step):
        frag = seq[p : p + insert]
        out.append((frag[:rlen], rc(frag[-rlen:])))
    return out


def main():
    build_tool()
    rng = random.Random(170)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    k = 15

    # 1. long repeat only pairs can span (170_pairs analog)
    shared = rand_seq(70)  # longer than any read
    a, c = rand_seq(100), rand_seq(100)
    b, d = rand_seq(100), rand_seq(100)
    seq1, seq2 = a + shared + c, b + shared + d
    # dense tiling makes the shared middle clearly NON-unique under the
    # Zerbino test, so BOTH junctions resolve regardless of the link
    # processing order (the reference's order is unordered_map
    # iteration — asserting an order-dependent outcome would pin an
    # unstable implementation detail)
    cover = tile(seq1, 45, 2) + tile(seq2, 45, 2)
    pairs = make_pairs(seq1, 40, 180, 5) + make_pairs(seq2, 40, 180, 5)
    write_fixture("repeat_span",
                  ["--expected-coverage", "13",
                   "--insert-expected-size", "180",
                   "--insert-size-std-dev", "15",
                   "--min-link-count", "3"], k, cover, pairs)

    # 2. two-segment gap handled by gap filling (no connecting path)
    c1, c2 = rand_seq(130), rand_seq(130)
    genome = c1 + rand_seq(12) + c2  # middle too thin to assemble
    cover = tile(c1, 45, 3) + tile(c2, 45, 3)
    pairs = make_pairs(genome, 40, 160, 4)
    write_fixture("gap_fill",
                  ["--expected-coverage", "15",
                   "--insert-expected-size", "160",
                   "--insert-size-std-dev", "20",
                   "--min-link-count", "3",
                   "--fill-gaps", "1", "--max-gap", "100"],
                  k, cover, pairs)

    # 3. direct adjacency (single shortest path through a short repeat)
    rep = rand_seq(30)
    seqA = rand_seq(110) + rep + rand_seq(110)
    cover = tile(seqA, 50, 3)
    pairs = make_pairs(seqA, 40, 170, 4)
    write_fixture("short_repeat",
                  ["--expected-coverage", "17",
                   "--insert-expected-size", "170",
                   "--insert-size-std-dev", "15",
                   "--min-link-count", "3"], k, cover, pairs)

    # 4. filtered: too few spanning pairs
    seqB = rand_seq(120) + rand_seq(40) + rand_seq(120)
    cover = tile(seqB, 50, 3)
    pairs = make_pairs(seqB, 40, 170, 60)
    write_fixture("filtered",
                  ["--expected-coverage", "17",
                   "--insert-expected-size", "170",
                   "--min-link-count", "10"], k, cover, pairs)

    # 5. mate-pair orientation
    seqC = rand_seq(110) + rand_seq(60) + rand_seq(110)
    cover = tile(seqC, 45, 3)
    mp = [(rc(l), rc(r)) for l, r in make_pairs(seqC, 40, 170, 5)]
    mp = [(r, l) for l, r in mp]
    write_fixture("mate_pairs",
                  ["--expected-coverage", "15",
                   "--insert-expected-size", "170",
                   "--insert-size-std-dev", "15",
                   "--min-link-count", "3",
                   "--orientation", "mp"], k, cover, mp)


if __name__ == "__main__":
    main()
