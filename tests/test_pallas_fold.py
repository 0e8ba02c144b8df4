"""Pallas merge-fold kernel — interpret-mode correctness.

Mirrors tests/test_pallas_merge.py: the real-TPU path is exercised by
bench.py; these tests run the same kernel through the Pallas interpreter
so the fold logic (merge + dedup + pack + live count) stays covered on
CPU.  Semantics under test: merge two sorted sentinel-padded runs,
summing counts of ALL equal keys (within-run duplicates included), and
return packed ascending unique keys plus the non-sentinel group count.
"""

import numpy as np
import pytest

from gossamer_tpu.ops.pallas_fold import merge_fold_planes
from gossamer_tpu.ops.pallas_merge import SENT32, TILE

rng = np.random.default_rng(7)


def mk_run(n_real, key_space=1 << 52, dup=False):
    keys = rng.integers(0, key_space, size=n_real, dtype=np.uint64)
    if dup and n_real:
        # force heavy duplication, including runs of equal keys
        keys = keys[rng.integers(0, max(1, n_real // 7), size=n_real)]
    keys = np.sort(keys)
    total = max(TILE, -(-max(n_real, 1) // TILE) * TILE)
    l1 = np.full(total, SENT32, np.uint32)
    l0 = np.full(total, SENT32, np.uint32)
    c = np.zeros(total, np.uint32)
    l1[:n_real] = (keys >> 32).astype(np.uint32)
    l0[:n_real] = keys.astype(np.uint32)
    c[:n_real] = rng.integers(1, 100, n_real)
    return l1, l0, c, keys, c[:n_real].copy()


def fold_expect(runs):
    """Brute-force: unique keys of the union, counts summed."""
    keys = np.concatenate([r[0] for r in runs])
    cnts = np.concatenate([r[1] for r in runs]).astype(np.uint64)
    order = np.argsort(keys, kind="stable")
    keys, cnts = keys[order], cnts[order]
    if not len(keys):
        return keys, cnts
    new = np.ones(len(keys), bool)
    new[1:] = keys[1:] != keys[:-1]
    idx = np.cumsum(new) - 1
    out = np.zeros(int(idx[-1]) + 1, np.uint64)
    np.add.at(out, idx, cnts)
    return keys[new], out


def run_fold(a, b):
    o1, o0, oc, live = merge_fold_planes(
        a[0], a[1], a[2], b[0], b[1], b[2], True)
    o1, o0, oc = map(np.asarray, (o1, o0, oc))
    live = int(live)
    keys = (o1.astype(np.uint64) << 32) | o0
    return keys, oc, live


@pytest.mark.parametrize("na,nb,dup", [
    (TILE, TILE, False),
    (3000, 5000, True),
    (TILE * 3, 100, True),
    (17, TILE * 2 + 11, True),
])
def test_merge_fold(na, nb, dup):
    a = mk_run(na, dup=dup)
    b = mk_run(nb, dup=dup)
    keys, oc, live = run_fold(a, b)
    ek, ec = fold_expect([(a[3], a[4]), (b[3], b[4])])
    assert live == len(ek)
    assert np.array_equal(keys[:live], ek)
    assert np.array_equal(oc[:live].astype(np.uint64), ec % (1 << 32))


def test_merge_fold_cross_run_collisions():
    """Equal keys split across the two runs must sum across runs."""
    a = mk_run(2000, key_space=512, dup=True)
    b = mk_run(3000, key_space=512, dup=True)
    keys, oc, live = run_fold(a, b)
    ek, ec = fold_expect([(a[3], a[4]), (b[3], b[4])])
    assert live == len(ek)
    assert np.array_equal(keys[:live], ek)
    assert np.array_equal(oc[:live].astype(np.uint64), ec % (1 << 32))


def test_merge_fold_single_key():
    """All lanes one key: group spans many tiles; count wraps mod 2^32."""
    n = TILE * 2
    l1 = np.zeros(n, np.uint32)
    l0 = np.full(n, 42, np.uint32)
    c = np.full(n, 1 << 20, np.uint32)
    keys, oc, live = run_fold((l1, l0, c), (l1.copy(), l0.copy(), c.copy()))
    assert live == 1
    assert keys[0] == 42
    assert int(oc[0]) == (2 * n * (1 << 20)) % (1 << 32)


def test_merge_fold_empty_side():
    """One run entirely sentinel (zero real lanes)."""
    a = mk_run(0)
    b = mk_run(5000, dup=True)
    keys, oc, live = run_fold(a, b)
    ek, ec = fold_expect([(b[3], b[4])])
    assert live == len(ek)
    assert np.array_equal(keys[:live], ek)
    assert np.array_equal(oc[:live].astype(np.uint64), ec % (1 << 32))
