"""Device sort-join classification vs the host engine."""

import random

import numpy as np
import jax.numpy as jnp

from gossamer_tpu.classify.annotated_set import compute_near_kmers, merge_and_annotate
from gossamer_tpu.classify.device import classify_codes_device, encode_set
from gossamer_tpu.classify.xenome import _batch_blrg
from gossamer_tpu.core import kmer as K
from gossamer_tpu.graph.build import build_kmer_set
from gossamer_tpu.io.readers import Read


def test_device_classify_matches_host():
    rng = random.Random(91)
    g = "".join(rng.choice("ACGT") for _ in range(500))
    h = "".join(rng.choice("ACGT") for _ in range(500))
    a, _ = build_kmer_set([Read("g", g.encode())], 15, chunk=4096)
    b, _ = build_kmer_set([Read("h", h.encode())], 15, chunk=4096)
    ann, _ = merge_and_annotate(a, b)
    compute_near_kmers(ann)

    reads = []
    for src in (g, h):
        for _ in range(10):
            p = rng.randrange(0, len(src) - 60)
            reads.append(src[p : p + 60])
    for _ in range(5):
        reads.append("".join(rng.choice("ACGTN") for _ in range(60)))
    reads.append("A" * 40)  # all-A probe (key-0 forward-fill edge case)

    codes = [K.encode_bases(s.encode()) for s in reads]
    want = _batch_blrg(codes, ann)
    set_E = jnp.asarray(encode_set(ann.kset.lo, ann.lhs, ann.rhs))
    got = classify_codes_device(codes, set_E, 15, window=1 << 12)
    np.testing.assert_array_equal(got, want)


def test_join_ranks_device_matches_host():
    """Device rank-join == host searchsorted join over matched windows."""
    import jax.numpy as jnp
    import numpy as np

    from gossamer_tpu.classify.device import join_ranks_device
    from gossamer_tpu.core import kmer as K
    from gossamer_tpu.graph.kmer_set import KmerSet
    from gossamer_tpu.ops.count import count_chunks

    rng = np.random.default_rng(23)
    k = 15
    g = rng.integers(0, 4, 4000, dtype=np.uint8)
    lo, hi, _ = count_chunks(iter([g]), k, both_strands=False,
                             canonical=True, chunk=len(g) - k + 1)
    ref = KmerSet(k, lo, hi)
    reads = []
    for i in range(100):
        s = int(rng.integers(0, len(g) - 70))
        reads.append(g[s : s + 70].copy())
    reads.append(rng.integers(0, 4, 70, dtype=np.uint8))
    reads.append(np.array([1, 2, 3], dtype=np.uint8))  # shorter than k

    got_rid, got_rank = join_ranks_device(reads, jnp.asarray(ref.lo), k,
                                          window=1 << 12)
    # host oracle
    w_rid, w_rank = [], []
    for i, c in enumerate(reads):
        n = len(c) - k + 1
        for p in range(max(n, 0)):
            win = c[p : p + k]
            if (win >= 4).any():
                continue
            v = 0
            for b in win:
                v = (v << 2) | int(b)
            lo1 = np.array([v], dtype=np.uint64)
            hi1 = np.zeros(1, dtype=np.uint64)
            nlo, nhi, _f = K.normalize(lo1, hi1, k)
            hit, r = ref.access_and_rank(nlo, nhi)
            if hit[0]:
                w_rid.append(i)
                w_rank.append(int(r[0]))
    # device output groups by batch; compare as multisets of pairs
    got = sorted(zip(got_rid.tolist(), got_rank.tolist()))
    want = sorted(zip(w_rid, w_rank))
    assert got == want and len(want) > 0


def test_classify_packed_stream_parity():
    """classify_batch_packed (sparse packed transfer) == classify_batch
    (u8 codes) blrg for the same reads."""
    import jax.numpy as jnp

    from gossamer_tpu.classify.device import (classify_codes_device,
                                              classify_packed_stream,
                                              encode_set)
    from gossamer_tpu.io.stream import pack_chunk

    k = 13
    rng = np.random.default_rng(8)
    glen = 4000
    genomes = [rng.integers(0, 4, size=glen, dtype=np.uint8)
               for _ in range(2)]
    sets = []
    for g in genomes:
        lo = np.zeros(glen - k + 1, np.uint64)
        v = 0
        mask = (1 << (2 * k)) - 1
        from gossamer_tpu.core import kmer as K

        for i in range(glen):
            v = ((v << 2) | int(g[i])) & mask
            if i >= k - 1:
                lo[i - k + 1] = v
        nlo, _, _ = K.normalize(lo, np.zeros_like(lo), k)
        sets.append(np.unique(nlo))
    union = np.union1d(sets[0], sets[1])
    lhs = np.isin(union, sets[0])
    rhs = np.isin(union, sets[1])
    set_E = jnp.asarray(encode_set(union, lhs, rhs))

    reads = []
    for i in range(300):
        s = int(rng.integers(0, glen - 50))
        r = genomes[i % 2][s : s + 50].copy()
        if i % 7 == 0:
            r[rng.integers(0, 50)] = 255  # an N
        reads.append(r)

    window = 1 << 15
    ref = classify_codes_device(reads, set_E, k, window=window)

    per = window // 64
    packed = []
    base = 0
    while base < len(reads):
        grp = []
        ln = 0
        while base < len(reads) and ln + len(reads[base]) + 1 <= window:
            grp.append(reads[base])
            ln += len(reads[base]) + 1
            base += 1
        parts = []
        for c in grp:
            parts.append(c)
            parts.append(np.array([255], np.uint8))
        flat = np.concatenate(parts)
        pad = window + k - 1 - len(flat)
        flat = np.concatenate([flat, np.full(pad, 255, np.uint8)])
        packed.append((*pack_chunk(flat, k, window), len(grp)))
    got = classify_packed_stream(packed, set_E, k, window)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    assert np.asarray(got).max() > 0


def test_classify_periodic_stream_parity():
    """Fixed-length words-only classify == the u8 path."""
    import jax.numpy as jnp

    from gossamer_tpu.classify.device import (classify_codes_device,
                                              classify_periodic_stream,
                                              encode_set)
    from gossamer_tpu.io.stream import pack_chunk

    k = 13
    L = 50
    T = L + 1
    rng = np.random.default_rng(12)
    glen = 4000
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
    set_E = jnp.asarray(encode_set(union, np.isin(union, sets[0]),
                                   np.isin(union, sets[1])))
    reads = []
    for i in range(400):
        s = int(rng.integers(0, glen - L))
        reads.append(genomes[i % 2][s : s + L])

    window = 1 << 14
    ref = classify_codes_device(reads, set_E, k, window=window)

    per = window // T
    packed = []
    for base in range(0, len(reads), per):
        grp = reads[base : base + per]
        parts = []
        for c in grp:
            parts.append(c)
            parts.append(np.array([255], np.uint8))
        flat = np.concatenate(parts)
        flat = np.concatenate(
            [flat, np.full(window + k - 1 - len(flat), 255, np.uint8)])
        packed.append((pack_chunk(flat, k, window)[0], len(grp)))
    got = classify_periodic_stream(packed, set_E, k, window, L)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    assert np.asarray(got).max() > 0


def test_classify_periodic_stream2_parity():
    """Round-5 two-sort periodic classifier == the u8 path (value
    re-canonicalized set, valid-only lanes, reshape-OR aggregation)."""
    import jax.numpy as jnp

    from gossamer_tpu.classify.device import (classify_codes_device,
                                              classify_periodic_stream2,
                                              encode_set)
    from gossamer_tpu.io.stream import pack_chunk

    k = 13
    L = 50
    T = L + 1
    rng = np.random.default_rng(5)
    glen = 4000
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
    set_E = jnp.asarray(encode_set(union, np.isin(union, sets[0]),
                                   np.isin(union, sets[1])))
    reads = []
    for i in range(400):
        s = int(rng.integers(0, glen - L))
        r = genomes[i % 2][s : s + L].copy()
        if i % 9 == 0:  # mismatches exercise partial/neither classes
            r[L // 2] = (r[L // 2] + 1) % 4
        reads.append(r)

    window = 1 << 14
    ref = classify_codes_device(reads, set_E, k, window=window)

    per = window // T
    packed = []
    for base in range(0, len(reads), per):
        grp = reads[base : base + per]
        parts = []
        for c in grp:
            parts.append(c)
            parts.append(np.array([255], np.uint8))
        flat = np.concatenate(parts)
        flat = np.concatenate(
            [flat, np.full(window + k - 1 - len(flat), 255, np.uint8)])
        packed.append((pack_chunk(flat, k, window)[0], len(grp)))
    got = classify_periodic_stream2(packed, set_E, k, window, L)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    assert np.asarray(got).max() > 0


def test_classify_wide_parity_k40():
    """Wide-key (k = 40) device classifier == the host searchsorted
    path (VERDICT r4 missing #2: k <= 62 on the device classify)."""
    from gossamer_tpu.classify.annotated_set import AnnotatedKmerSet
    from gossamer_tpu.classify.device import (classify_codes_device_wide,
                                              encode_set_wide)
    from gossamer_tpu.classify.xenome import _batch_blrg
    from gossamer_tpu.core import kmer as K
    from gossamer_tpu.graph.kmer_set import KmerSet

    k = 40
    rng = np.random.default_rng(4)
    glen = 6000
    genomes = [rng.integers(0, 4, size=glen, dtype=np.uint8)
               for _ in range(2)]
    sets = []
    for g in genomes:
        n_win = glen - k + 1
        lo = np.zeros(n_win, np.uint64)
        hi = np.zeros(n_win, np.uint64)
        for j in range(k):
            b = g[j : j + n_win].astype(np.uint64)
            hi = (hi << np.uint64(2)) | (lo >> np.uint64(62))
            lo = (lo << np.uint64(2)) | b
        nlo, nhi, _ = K.normalize(lo, hi, k)
        key = [(int(h), int(l)) for h, l in zip(nhi, nlo)]
        uniq = sorted(set(key))
        sets.append((np.array([l for _, l in uniq], np.uint64),
                     np.array([h for h, _ in uniq], np.uint64)))
    # union by (hi, lo)
    pairs = sorted(set(zip(sets[0][1].tolist(), sets[0][0].tolist()))
                   | set(zip(sets[1][1].tolist(), sets[1][0].tolist())))
    uhi = np.array([h for h, _ in pairs], np.uint64)
    ulo = np.array([l for _, l in pairs], np.uint64)
    in0 = np.array([(h, l) in set(zip(sets[0][1].tolist(),
                                      sets[0][0].tolist()))
                    for h, l in pairs])
    in1 = np.array([(h, l) in set(zip(sets[1][1].tolist(),
                                      sets[1][0].tolist()))
                    for h, l in pairs])
    ann = AnnotatedKmerSet(KmerSet(k, ulo, uhi), in0, in1)

    L = 90
    reads = []
    for i in range(300):
        s = int(rng.integers(0, glen - L))
        r = genomes[i % 2][s : s + L].copy()
        if i % 8 == 0:
            r[L // 2] = (r[L // 2] + 1) % 4
        reads.append(r)
    exp = _batch_blrg(reads, ann)
    planes = encode_set_wide(ulo, uhi, in0, in1, k)
    got = classify_codes_device_wide(reads, planes, k, window=1 << 14)
    assert np.array_equal(np.asarray(got), exp)
    assert exp.max() > 0
