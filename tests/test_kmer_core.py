"""Host k-mer core vs the brute-force spec model."""

import numpy as np
import pytest

from gossamer_tpu.core import kmer as K

from specmodel import (
    M64,
    py_decode,
    py_encode,
    py_fnv,
    py_normalize,
    py_rev2_64,
    py_revcomp,
)


def rand_kmers(rng, n, k):
    bits = 2 * k
    vals = [rng.getrandbits(bits) for _ in range(n)]
    lo = np.array([v & M64 for v in vals], dtype=np.uint64)
    hi = np.array([v >> 64 for v in vals], dtype=np.uint64)
    return vals, lo, hi


def test_rev2_matches_model():
    import random

    rng = random.Random(7)
    xs = [rng.getrandbits(64) for _ in range(200)] + [0, M64, 1, 3 << 62]
    arr = np.array(xs, dtype=np.uint64)
    got = K.rev2(arr)
    want = np.array([py_rev2_64(x) for x in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [1, 5, 25, 26, 31, 32, 33, 47, 62, 63])
def test_revcomp_matches_model(k):
    import random

    rng = random.Random(k)
    vals, lo, hi = rand_kmers(rng, 100, k)
    glo, ghi = K.reverse_complement(lo, hi, k)
    want = [py_revcomp(v, k) for v in vals]
    np.testing.assert_array_equal(glo, np.array([w & M64 for w in want], dtype=np.uint64))
    np.testing.assert_array_equal(ghi, np.array([w >> 64 for w in want], dtype=np.uint64))


@pytest.mark.parametrize("k", [25, 33, 62])
def test_revcomp_involution(k):
    import random

    rng = random.Random(k + 100)
    _, lo, hi = rand_kmers(rng, 64, k)
    l2, h2 = K.reverse_complement(*K.reverse_complement(lo, hi, k), k)
    np.testing.assert_array_equal(l2, lo)
    np.testing.assert_array_equal(h2, hi)


def test_fnv_matches_model():
    import random

    rng = random.Random(3)
    vals, lo, hi = rand_kmers(rng, 200, 62)
    got = K.fnv_hash(lo, hi)
    want = np.array([py_fnv(v) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [5, 25, 31, 32, 41, 62])
def test_normalize_matches_model(k):
    import random

    rng = random.Random(k * 17)
    vals, lo, hi = rand_kmers(rng, 150, k)
    nlo, nhi, _ = K.normalize(lo, hi, k)
    want = [py_normalize(v, k) for v in vals]
    np.testing.assert_array_equal(nlo, np.array([w & M64 for w in want], dtype=np.uint64))
    np.testing.assert_array_equal(nhi, np.array([w >> 64 for w in want], dtype=np.uint64))


def test_string_round_trip():
    import random

    rng = random.Random(11)
    for k in (1, 25, 33, 62):
        s = "".join(rng.choice("ACGT") for _ in range(k))
        lo, hi = K.string_to_kmer(s)
        assert K.kmer_to_string(k, lo, hi) == s
        assert py_decode(py_encode(s), k) == s


def test_kmers_to_strings_vectorized():
    import random

    rng = random.Random(5)
    for k in (25, 33, 62):
        vals, lo, hi = rand_kmers(rng, 40, k)
        mat = K.kmers_to_strings(k, lo, hi)
        for i, v in enumerate(vals):
            assert mat[i].tobytes().decode() == py_decode(v, k)


def test_edge_from_to():
    # edge = (k+1)-mer; from = leading k bases, to = trailing k bases
    k = 31
    s = "ACGTACGTACGTACGTACGTACGTACGTACGT"  # 32 bases = k+1
    lo, hi = K.string_to_kmer(s)
    flo, fhi = K.edge_from_node(np.array([lo], dtype=np.uint64), np.array([hi], dtype=np.uint64))
    tlo, thi = K.edge_to_node(np.array([lo], dtype=np.uint64), np.array([hi], dtype=np.uint64), k)
    assert K.kmer_to_string(k, flo[0], fhi[0]) == s[:-1]
    assert K.kmer_to_string(k, tlo[0], thi[0]) == s[1:]


def test_encode_bases_invalid():
    codes = K.encode_bases("ACGTNacgtn")
    np.testing.assert_array_equal(codes[:4], [0, 1, 2, 3])
    assert codes[4] == 255
    np.testing.assert_array_equal(codes[5:9], [0, 1, 2, 3])
    assert codes[9] == 255
