"""Pallas streaming merge kernel — interpret-mode correctness.

The real-TPU path is validated manually (485M lanes/s vs XLA sort's
165M at 16M lanes on v5e); these tests run the same kernel through the
Pallas interpreter so the logic stays covered on CPU.
"""

import numpy as np
import pytest

from gossamer_tpu.ops.pallas_merge import SENT32, TILE, merge_sorted_planes

rng = np.random.default_rng(0)


def mk_run(n_real, key_space=1 << 52):
    keys = np.sort(rng.integers(0, key_space, size=n_real, dtype=np.uint64))
    total = -(-max(n_real, 1) // TILE) * TILE if n_real else 0
    l1 = np.full(total, SENT32, np.uint32)
    l0 = np.full(total, SENT32, np.uint32)
    c = np.zeros(total, np.uint32)
    l1[:n_real] = (keys >> 32).astype(np.uint32)
    l0[:n_real] = keys.astype(np.uint32)
    c[:n_real] = rng.integers(1, 100, n_real)
    return l1, l0, c, keys


@pytest.mark.parametrize("na,nb", [
    (TILE, TILE), (3000, 5000), (0, TILE), (TILE * 4, 100),
])
def test_merge_sorted_planes(na, nb):
    a1, a0, ac, ka = mk_run(na)
    b1, b0, bc, kb = mk_run(nb)
    o1, o0, oc = merge_sorted_planes(a1, a0, ac, b1, b0, bc, True)
    o1, o0, oc = map(np.asarray, (o1, o0, oc))
    keys = (o1.astype(np.uint64) << 32) | o0
    exp = np.sort(np.concatenate([ka, kb]))
    assert np.array_equal(keys[: len(exp)], exp)
    assert (keys[len(exp):] == (np.uint64(SENT32) << 32 | SENT32)).all()
    # counts travel with their keys (multiset check; equal keys may swap)
    from collections import Counter

    in_keys = np.concatenate([
        (a1.astype(np.uint64) << 32) | a0,
        (b1.astype(np.uint64) << 32) | b0,
    ])
    in_c = np.concatenate([ac, bc])
    assert Counter(zip(in_keys.tolist(), in_c.tolist())) == Counter(
        zip(keys.tolist(), oc.tolist()))


def test_merge_equal_keys_keep_payloads():
    """Regression: equal keys with distinct counts must not duplicate or
    drop payloads through the bitonic exchanges (strict-compare pairing)."""
    from collections import Counter

    a1, a0, ac, ka = mk_run(3000, key_space=64)
    b1, b0, bc, kb = mk_run(5000, key_space=64)
    o1, o0, oc = merge_sorted_planes(a1, a0, ac, b1, b0, bc, True)
    o1, o0, oc = map(np.asarray, (o1, o0, oc))
    keys = (o1.astype(np.uint64) << 32) | o0
    in_keys = np.concatenate([
        (a1.astype(np.uint64) << 32) | a0,
        (b1.astype(np.uint64) << 32) | b0,
    ])
    in_c = np.concatenate([ac, bc])
    assert np.array_equal(keys, np.sort(in_keys))
    assert Counter(zip(in_keys.tolist(), in_c.tolist())) == Counter(
        zip(keys.tolist(), oc.tolist()))
