"""Sharded (set-partitioned) classification vs the single-device join."""

import random

import numpy as np
import pytest

import jax

from gossamer_tpu.classify.device import classify_codes_device, encode_set
from gossamer_tpu.core import kmer as K
from gossamer_tpu.parallel.classify_sharded import ShardedClassifier
from gossamer_tpu.parallel.mesh import data_mesh


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


@pytest.fixture
def annotated(scope="module"):
    rng = random.Random(5)
    k = 15
    genomes = [rand_seq(rng, 800), rand_seq(rng, 800)]
    sets = []
    from specmodel import py_normalize, read_kmers

    for g in genomes:
        sets.append({py_normalize(v, k) for v in read_kmers(g, k)})
    union = np.array(sorted(sets[0] | sets[1]), np.uint64)
    lhs = np.array([v in sets[0] for v in union])
    rhs = np.array([v in sets[1] for v in union])
    set_E = encode_set(union, lhs, rhs)
    reads = [rand_seq(rng, 60) for _ in range(40)]
    reads += [genomes[0][i : i + 60] for i in range(0, 700, 37)]
    reads += [genomes[1][i : i + 60] for i in range(0, 700, 41)]
    codes = [K.encode_bases(r) for r in reads]
    return set_E, codes, k


def test_sharded_classify_matches_single(annotated):
    set_E, codes, k = annotated
    assert len(jax.devices()) == 8
    import jax.numpy as jnp

    want = classify_codes_device(codes, jnp.asarray(set_E), k,
                                 window=1 << 12)
    sc = ShardedClassifier(data_mesh(), set_E, k, window=1 << 12)
    got = sc.classify_codes(codes)
    np.testing.assert_array_equal(got, want)
    assert got.max() > 0


def test_sharded_classify_uneven_set(annotated):
    """Set length not divisible by the mesh: sentinel padding must not
    produce phantom matches."""
    set_E, codes, k = annotated
    import jax.numpy as jnp

    odd = set_E[: len(set_E) - (len(set_E) % 8) - 3]
    want = classify_codes_device(codes, jnp.asarray(odd), k,
                                 window=1 << 12)
    sc = ShardedClassifier(data_mesh(), odd, k, window=1 << 12)
    got = sc.classify_codes(codes)
    np.testing.assert_array_equal(got, want)


def test_ring_classify_matches_single_device():
    """Ring read-rotation (ppermute blocks over resident set slices) ==
    single-device classify, blocks spanning multiple rotation cycles."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gossamer_tpu.classify.device import (classify_codes_device,
                                              encode_set)
    from gossamer_tpu.parallel.classify_sharded import RingClassifier

    k = 11
    rng = np.random.default_rng(17)
    glen = 3000
    genomes = [rng.integers(0, 4, size=glen, dtype=np.uint8)
               for _ in range(2)]
    from gossamer_tpu.core import kmer as K

    sets = []
    for g in genomes:
        lo = np.zeros(glen - k + 1, np.uint64)
        v = 0
        mask = (1 << (2 * k)) - 1
        for i in range(glen):
            v = ((v << 2) | int(g[i])) & mask
            if i >= k - 1:
                lo[i - k + 1] = v
        nlo, _, _ = K.normalize(lo, np.zeros_like(lo), k)
        sets.append(np.unique(nlo))
    union = np.union1d(sets[0], sets[1])
    set_E = encode_set(union, np.isin(union, sets[0]),
                       np.isin(union, sets[1]))

    reads = []
    for i in range(730):
        s = int(rng.integers(0, glen - 40))
        reads.append(genomes[i % 2][s : s + 40])

    ref = classify_codes_device(reads, jnp.asarray(set_E), k,
                                window=1 << 13)
    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    ring = RingClassifier(mesh, set_E, k, window=1 << 12)
    got = ring.classify_codes(reads)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    assert np.asarray(got).max() > 0
