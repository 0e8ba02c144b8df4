"""Delta-compressed spectrum pull (5 B/key device->host path)."""

import numpy as np
import jax.numpy as jnp

from gossamer_tpu.ops import engine as E


def pack_unpack(lo64, counts, cap):
    sent = np.uint32(E.SENT32)
    n = len(lo64)
    l1 = np.full(cap, sent, np.uint32)
    l0 = np.full(cap, sent, np.uint32)
    c = np.zeros(cap, np.uint32)
    l1[:n] = (lo64 >> np.uint64(32)).astype(np.uint32)
    l0[:n] = lo64.astype(np.uint32)
    c[:n] = counts
    pieces, exc, n_exc = E._delta_pack(jnp.asarray(l1), jnp.asarray(l0),
                                       jnp.asarray(c), cap)
    npc = -(-cap // E._PIECE)
    k = min(npc, -(-max(n, 1) // E._PIECE))
    d = [np.asarray(p) for p in pieces[:k]]
    cp = [np.asarray(p) for p in pieces[npc : npc + k]]
    exc_np = np.concatenate([np.asarray(p) for p in exc], axis=1)
    lo, cnt = E._delta_unpack(d, cp, exc_np, int(n_exc), n)
    return lo, cnt, int(n_exc)


def test_delta_pull_exact_with_exceptions():
    rng = np.random.default_rng(0)
    cap = 1 << 14
    n = 5000
    # mostly small deltas, some >= 2^32, counts incl. >= 255
    deltas = rng.integers(1, 1 << 20, size=n).astype(np.uint64)
    wide = rng.choice(n, size=37, replace=False)
    deltas[wide] = (np.uint64(1) << np.uint64(33)) + rng.integers(
        0, 1 << 10, size=37).astype(np.uint64)
    lo = np.cumsum(deltas).astype(np.uint64)
    counts = rng.integers(1, 200, size=n).astype(np.uint32)
    big = rng.choice(n, size=23, replace=False)
    counts[big] = rng.integers(255, 1 << 20, size=23).astype(np.uint32)
    got_lo, got_c, n_exc = pack_unpack(lo, counts, cap)
    np.testing.assert_array_equal(got_lo, lo)
    np.testing.assert_array_equal(got_c, counts.astype(np.int64))
    assert n_exc >= 37 + 23


def test_delta_pull_dense_spectrum():
    """All-small deltas and counts: exceptions = just the first lane."""
    cap = 1 << 14
    n = cap - 7
    lo = (np.arange(n, dtype=np.uint64) * np.uint64(97)) + np.uint64(5)
    counts = np.full(n, 3, np.uint32)
    got_lo, got_c, n_exc = pack_unpack(lo, counts, cap)
    np.testing.assert_array_equal(got_lo, lo)
    np.testing.assert_array_equal(got_c, 3)
    assert n_exc <= 8  # first lane + sentinel boundary


def test_engine_large_spectrum_uses_delta_path(monkeypatch):
    """End-to-end: a spectrum above the delta threshold round-trips
    exactly through SpectrumEngine.finish()."""
    import gossamer_tpu.ops.engine as eng

    calls = []
    orig = eng.SpectrumEngine._pull_delta

    def spy(self, planes, n_out):
        out = orig(self, planes, n_out)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(eng.SpectrumEngine, "_pull_delta", spy)
    monkeypatch.setattr(eng, "_DELTA_MIN", 1)

    rho = 12  # 24-bit key space: 65K keys are DENSE (small deltas)
    chunk = 1 << 16
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=chunk + rho - 1, dtype=np.uint8)
    e = eng.SpectrumEngine(rho, "plain", chunk, cap=1 << 18, batch=1)
    e.add_chunk(codes)
    lo, hi, c = e.finish()
    assert calls and calls[0], "delta pull was not exercised"
    # oracle: brute-force window counting
    mask = np.uint64((1 << (2 * rho)) - 1)
    w = codes.astype(np.uint64)
    lo_w = np.zeros(chunk, np.uint64)
    for j in range(rho):
        lo_w = (lo_w << np.uint64(2)) | (w[j : j + chunk] & np.uint64(3))
    lo_w &= mask
    want_lo, want_c = np.unique(lo_w, return_counts=True)
    np.testing.assert_array_equal(lo, want_lo)
    np.testing.assert_array_equal(c, want_c)
