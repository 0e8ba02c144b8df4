"""Generate build-scaffold + scaffold gold-parity fixtures.

Compiles scripts/baseline/ref_scaffold.cc — the reference's own
ScaffoldGraph/SuperGraph/PairAligner sources driving build-scaffold
(``/root/reference/src/GossCmdBuildScaffold.cc:297-443``) and the
scaffold command's linearisation (``GossCmdScaffold.cc:612-786``) — and
records the final gap-joined superpaths.  tests/test_ref_parity_scaffold
asserts our build_scaffold + scaffold make the identical placements.

Usage: python scripts/make_ref_scaffold_fixtures.py
"""

import os
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "data", "ref_scaffold")
TOOL = "/tmp/ref_scaffold"

from make_ref_threading_fixtures import REF_SRC, dump_text, rc, spectrum  # noqa: E402
from make_ref_pairs_fixtures import make_pairs, tile  # noqa: E402


def build_tool():
    base = os.path.join(ROOT, "scripts", "baseline")
    cmd = [
        "g++", "-O2", "-std=c++17", "-pthread", "-DGOSS_PLATFORM_UNIX",
        "-DGOSS_COMPILER_GNU", "-I", os.path.join(base, "boost_shim"),
        "-include", "boost/assert.hpp", "-include", "boost/shared_ptr.hpp",
        "-I", "/root/reference/src",
        os.path.join(base, "ref_scaffold.cc"),
        "/root/reference/src/ScaffoldGraph.cc",
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


def main():
    build_tool()
    import random

    rng = random.Random(172)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    k = 15

    # 1. two contigs with an unassembled gap -> one gap-joined scaffold
    c1, c2 = rand_seq(150), rand_seq(150)
    genome = c1 + rand_seq(25) + c2
    cover = tile(c1, 45, 3) + tile(c2, 45, 3)
    pairs = make_pairs(genome, 40, 180, 4)
    write_fixture("two_contigs",
                  ["--expected-coverage", "15",
                   "--insert-expected-size", "180",
                   "--insert-size-std-dev", "15",
                   "--min-link-count", "3"], k, cover, pairs)

    # 2. three contigs in a chain
    c1, c2, c3 = rand_seq(140), rand_seq(120), rand_seq(140)
    genome = c1 + rand_seq(22) + c2 + rand_seq(28) + c3
    cover = tile(c1, 45, 3) + tile(c2, 45, 3) + tile(c3, 45, 3)
    pairs = make_pairs(genome, 40, 170, 4)
    write_fixture("chain3",
                  ["--expected-coverage", "15",
                   "--insert-expected-size", "170",
                   "--insert-size-std-dev", "20",
                   "--min-link-count", "3"], k, cover, pairs)

    # 3. overlapping contig ends (negative gap -> the 7-mer alignEnds)
    c1 = rand_seq(150)
    ovl = c1[-10:]
    c2 = ovl + rand_seq(140)
    genome = c1 + c2[10:]
    cover = tile(c1, 45, 3) + tile(c2, 45, 3)
    pairs = make_pairs(genome, 40, 170, 4)
    write_fixture("overlap",
                  ["--expected-coverage", "15",
                   "--insert-expected-size", "170",
                   "--insert-size-std-dev", "20",
                   "--min-link-count", "3"], k, cover, pairs)

    # 4. under-supported links filtered at read time
    c1, c2 = rand_seq(150), rand_seq(150)
    genome = c1 + rand_seq(30) + c2
    cover = tile(c1, 45, 3) + tile(c2, 45, 3)
    pairs = make_pairs(genome, 40, 190, 40)
    write_fixture("filtered",
                  ["--expected-coverage", "15",
                   "--insert-expected-size", "190",
                   "--min-link-count", "10"], k, cover, pairs)

    # 5. two independent scaffolds
    a1, a2 = rand_seq(130), rand_seq(130)
    b1, b2 = rand_seq(130), rand_seq(130)
    gA = a1 + rand_seq(24) + a2
    gB = b1 + rand_seq(26) + b2
    cover = (tile(a1, 45, 3) + tile(a2, 45, 3)
             + tile(b1, 45, 3) + tile(b2, 45, 3))
    pairs = make_pairs(gA, 40, 175, 4) + make_pairs(gB, 40, 175, 4)
    write_fixture("components",
                  ["--expected-coverage", "15",
                   "--insert-expected-size", "175",
                   "--insert-size-std-dev", "15",
                   "--min-link-count", "3"], k, cover, pairs)


if __name__ == "__main__":
    main()
