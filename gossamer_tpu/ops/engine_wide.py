"""Engine v2 for wide keys (31 < rho <= 63): four u32 limb planes.

Counterpart of :mod:`gossamer_tpu.ops.engine` for 2*rho > 62 — the
reference's headline k <= 62 range (``src/Graph.hh:87-89``).  Same
design: keys travel as explicit uint32 limbs (XLA emulates 64-bit
vector ops as u32 pairs with real overhead; keeping limbs explicit
halves the emulation slop), one sort per batch with the running
spectrum concatenated in, counts by wrapped-cumsum difference.

Replaces the per-chunk u64 :class:`gossamer_tpu.ops.count.
SpectrumAccumulator` fallback that sorted every lane O(log R) times
per run (round-2 Weak #8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
SENT32 = 0xFFFFFFFF


def wide_keys(rho: int) -> bool:
    """2*rho in (62, 126): four u32 limbs with sentinel headroom."""
    return 62 < 2 * rho <= 126


def kmerize_planes_wide(codes, rho: int):
    """uint8[..., W] -> (p3, p2, p1, p0, valid) of the W-rho+1 windows."""
    C = codes.shape[-1] - rho + 1
    p0 = jnp.zeros(codes.shape[:-1] + (C,), U32)
    p1 = jnp.zeros_like(p0)
    p2 = jnp.zeros_like(p0)
    p3 = jnp.zeros_like(p0)
    valid = jnp.ones(p0.shape, bool)
    for j in range(rho):
        b = codes[..., j : j + C]
        valid &= b < 4
        p3 = (p3 << 2) | (p2 >> 30)
        p2 = (p2 << 2) | (p1 >> 30)
        p1 = (p1 << 2) | (p0 >> 30)
        p0 = (p0 << 2) | (b.astype(U32) & U32(3))
    return p3, p2, p1, p0, valid


def _rev2(x):
    m2, m4, m8 = U32(0x33333333), U32(0x0F0F0F0F), U32(0x00FF00FF)
    x = ((x & m2) << 2) | ((x >> 2) & m2)
    x = ((x & m4) << 4) | ((x >> 4) & m4)
    x = ((x & m8) << 8) | ((x >> 8) & m8)
    return (x << 16) | (x >> 16)


def _shr(planes, s: int):
    """Static right shift of a 128-bit value in 4 u32 limbs."""
    p3, p2, p1, p0 = planes
    limbs = [p3, p2, p1, p0]
    w, r = divmod(s, 32)
    if w:
        limbs = [jnp.zeros_like(p3)] * w + limbs[: 4 - w]
    if r:
        out = []
        carry = jnp.zeros_like(p3)
        for x in limbs:
            out.append((x >> r) | (carry << (32 - r)))
            carry = x
        limbs = out
    return tuple(limbs)


def rc_planes_wide(p3, p2, p1, p0, rho: int):
    """Reverse complement (``src/BigInteger.hh:193-216``): NOT, 2-bit
    reverse (limb order flips), shift down by 128 - 2*rho."""
    n = (_rev2(~p0), _rev2(~p1), _rev2(~p2), _rev2(~p3))
    return _shr(n, 128 - 2 * rho)


def _less4(a, b):
    a3, a2, a1, a0 = a
    b3, b2, b1, b0 = b
    lt = a0 < b0
    for x, y in ((a1, b1), (a2, b2), (a3, b3)):
        lt = (x < y) | ((x == y) & lt)
    return lt


def canon_value_wide(p3, p2, p1, p0, rho: int):
    r = rc_planes_wide(p3, p2, p1, p0, rho)
    take = _less4(r, (p3, p2, p1, p0))
    return tuple(jnp.where(take, r[i], (p3, p2, p1, p0)[i])
                 for i in range(4))


def fnv_planes_wide(p3, p2, p1, p0):
    """FNV-1a over the 16 LE bytes of the 128-bit value, digit-
    decomposed (``src/BigInteger.hh:528-536,572-582``)."""
    FNV_OFFSET = 14695981039346656037
    d = [jnp.full(p0.shape, (FNV_OFFSET >> (16 * i)) & 0xFFFF, U32)
         for i in range(4)]
    m16, c1b3 = U32(0xFFFF), U32(0x1B3)

    def step(d, byte):
        d0 = d[0] ^ byte
        t = [d0 * c1b3, d[1] * c1b3, d[2] * c1b3, d[3] * c1b3]
        r2 = (d0 << 8) & m16
        r3 = ((d0 >> 8) | (d[1] << 8)) & m16
        s0 = t[0]
        s1 = t[1] + (s0 >> 16)
        s2 = t[2] + r2 + (s1 >> 16)
        s3 = t[3] + r3 + (s2 >> 16)
        return [s0 & m16, s1 & m16, s2 & m16, s3 & m16]

    for word in (p0, p1, p2, p3):
        for i in range(4):
            d = step(d, (word >> (8 * i)) & U32(0xFF))
    return (d[3] << 16) | d[2], (d[1] << 16) | d[0]


def canon_ref_wide(p3, p2, p1, p0, rho: int):
    """min by (FNV hash, value) (``src/RankSelect.hh:126-140``)."""
    r = rc_planes_wide(p3, p2, p1, p0, rho)
    fh, fl = fnv_planes_wide(p3, p2, p1, p0)
    rh, rl = fnv_planes_wide(*r)
    hl = (rh < fh) | ((rh == fh) & (rl < fl))
    eq = (rh == fh) & (rl == fl)
    take = hl | (eq & _less4(r, (p3, p2, p1, p0)))
    return tuple(jnp.where(take, r[i], (p3, p2, p1, p0)[i])
                 for i in range(4))


_CANON_W = {"plain": None, "value": canon_value_wide, "ref": canon_ref_wide}


def _sort_count_compact_wide(k3, k2, k1, k0, w, cap: int):
    """4-limb analog of :func:`gossamer_tpu.ops.engine.
    _sort_count_compact`."""
    n = k3.shape[0]
    k3, k2, k1, k0, w = jax.lax.sort((k3, k2, k1, k0, w), num_keys=4)
    S = jnp.cumsum(w)
    is_new = jnp.ones((n,), bool).at[1:].set(
        (k3[1:] != k3[:-1]) | (k2[1:] != k2[:-1])
        | (k1[1:] != k1[:-1]) | (k0[1:] != k0[:-1]))
    is_last = jnp.ones((n,), bool).at[:-1].set(is_new[1:])
    lane = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    comp_key = jnp.where(is_last, lane, jnp.int32(n))
    _, k3, k2, k1, k0, S = jax.lax.sort(
        (comp_key, k3, k2, k1, k0, S), num_keys=1)
    k3, k2, k1, k0, S = k3[:cap], k2[:cap], k1[:cap], k0[:cap], S[:cap]
    c = S - jnp.concatenate([jnp.zeros((1,), U32), S[:-1]])
    n_groups = jnp.sum(is_new.astype(jnp.int32))
    idx = jnp.minimum(n_groups - 1, cap - 1)
    sent = U32(SENT32)
    has_sent = ((k3[idx] == sent) & (k2[idx] == sent)
                & (k1[idx] == sent) & (k0[idx] == sent))
    live = jnp.where(has_sent, n_groups - 1, n_groups)
    lane = jnp.arange(cap, dtype=jnp.int32)
    keep = lane < live
    return (jnp.where(keep, k3, sent), jnp.where(keep, k2, sent),
            jnp.where(keep, k1, sent), jnp.where(keep, k0, sent),
            jnp.where(keep, c, U32(0)), live)


@partial(jax.jit, static_argnums=(5, 6, 7))
def batch_step_wide(codes, s3, s2, s1, s0, rho: int, mode: str, cap: int,
                    s_c=None):
    p3, p2, p1, p0, valid = kmerize_planes_wide(codes, rho)
    p3, p2, p1, p0 = (x.reshape(-1) for x in (p3, p2, p1, p0))
    valid = valid.reshape(-1)
    canon = _CANON_W[mode]
    if canon is not None:
        p3, p2, p1, p0 = canon(p3, p2, p1, p0, rho)
    sent = U32(SENT32)
    p3 = jnp.where(valid, p3, sent)
    p2 = jnp.where(valid, p2, sent)
    p1 = jnp.where(valid, p1, sent)
    p0 = jnp.where(valid, p0, sent)
    c = valid.astype(U32)
    return _sort_count_compact_wide(
        jnp.concatenate([s3, p3]), jnp.concatenate([s2, p2]),
        jnp.concatenate([s1, p1]), jnp.concatenate([s0, p0]),
        jnp.concatenate([s_c, c]), cap)


@partial(jax.jit, static_argnums=(5,))
def expand_step_wide(p3, p2, p1, p0, c, rho: int):
    """Canonical classes -> symmetric fwd+rc spectrum (wide)."""
    cap = p3.shape[0]
    sent = U32(SENT32)
    is_sent = (p3 == sent) & (p2 == sent) & (p1 == sent) & (p0 == sent)
    r = rc_planes_wide(p3, p2, p1, p0, rho)
    r = tuple(jnp.where(is_sent, sent, x) for x in r)
    return _sort_count_compact_wide(
        jnp.concatenate([p3, r[0]]), jnp.concatenate([p2, r[1]]),
        jnp.concatenate([p1, r[2]]), jnp.concatenate([p0, r[3]]),
        jnp.concatenate([c, c]), 2 * cap)


class SpectrumEngineWide:
    """Wide-key counterpart of :class:`gossamer_tpu.ops.engine.
    SpectrumEngine` (host driver, XLA sort path, no packed transfer)."""

    def __init__(self, rho: int, mode: str, chunk: int, batch: int = 8,
                 cap: int = 1 << 22, spill: bool = True, on_spill=None):
        assert wide_keys(rho)
        assert mode in _CANON_W
        self.rho = rho
        self.mode = mode
        self.chunk = chunk
        self.batch = batch
        self.req_cap = cap
        self.cap = 0
        self.spill_enabled = spill
        self.on_spill = on_spill
        self.spills = 0
        self.buf: list[np.ndarray] = []
        self.spec = None
        self.live_scalars: list = []
        self.host_runs: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._checked_live = 0
        self._lanes_since_check = 0

    def _empty_spec(self):
        sent = np.uint32(SENT32)
        z = jnp.full((self.cap,), sent)
        return (z, z, z, z, jnp.zeros((self.cap,), U32))

    def add_chunk(self, codes: np.ndarray) -> None:
        self.buf.append(codes)
        if len(self.buf) >= self.batch:
            self._flush()

    def _flush(self) -> None:
        if not self.buf:
            return
        if self.spec is not None and len(self.buf) < self.batch:
            pad = np.full_like(self.buf[0], 255)
            while len(self.buf) < self.batch:
                self.buf.append(pad)
        stack = jnp.asarray(np.stack(self.buf))
        batch_lanes = len(self.buf) * self.chunk
        self.buf = []
        want = min(self.req_cap, max(1 << 14, 2 * batch_lanes))
        if want > self.cap:
            if self.spec is not None and self.live_scalars:
                self._spill_to_host()
            self.cap = want
            self.spec = self._empty_spec()
        elif self.spec is None:
            self.spec = self._empty_spec()
        out = batch_step_wide(stack, *self.spec[:4], self.rho, self.mode,
                              self.cap, s_c=self.spec[4])
        self.spec = out[:5]
        live = out[5]
        self.live_scalars.append(live)
        self._lanes_since_check += batch_lanes
        bound = self._checked_live + self._lanes_since_check
        next_lanes = self.batch * self.chunk
        if bound + next_lanes > self.cap:
            self._checked_live = int(live)
            self._lanes_since_check = 0
            if self._checked_live > self.cap:
                raise RuntimeError(
                    f"distinct keys of one batch ({self._checked_live}) "
                    f"exceeded cap ({self.cap}); raise --spectrum-cap")
            if self._checked_live + next_lanes > self.cap:
                if self.cap < self.req_cap:
                    self._spill_to_host()
                    self.cap = min(self.req_cap, 2 * self.cap)
                    self.spec = self._empty_spec()
                elif self.spill_enabled:
                    self._spill_to_host()
                else:
                    raise RuntimeError(
                        f"spectrum working set exceeded cap ({self.cap})")

    def _pull(self, planes, n_out: int):
        p3, p2, p1, p0, c = (np.asarray(x)[:n_out] for x in planes)
        lo = (p1.astype(np.uint64) << 32) | p0
        hi = (p3.astype(np.uint64) << 32) | p2
        return lo, hi, c.astype(np.int64)

    def _spill_to_host(self) -> None:
        n_out = int(self.live_scalars[-1]) if self.live_scalars else 0
        self._check_live()
        lo, hi, c = self._pull(self.spec, n_out)
        from ..io.native import encode_spill_run128

        enc = encode_spill_run128(lo, hi, c)
        if enc is not None:
            # varint-delta encoded (~6-10 B/key vs 24 raw; reference
            # spill-record shape, src/EdgeAndCount.hh:86-97)
            self.host_runs.append((("eac128", enc, n_out), None, None))
        else:
            self.host_runs.append((lo, hi, c))
        self.spills += 1
        if self.on_spill is not None:
            self.on_spill(self.spills, n_out)
        self.spec = self._empty_spec()
        self.live_scalars = []
        self._checked_live = 0
        self._lanes_since_check = 0

    def _check_live(self):
        arr = [int(x) for x in self.live_scalars]
        if arr and max(arr) > self.cap:
            raise RuntimeError(
                f"spectrum working set ({max(arr)}) exceeded cap "
                f"({self.cap}); rerun with a larger --spectrum-cap")

    def _merged_host(self):
        from .count import _host_merge
        from ..io.native import decode_spill_run128

        runs = []
        for r in self.host_runs:
            if isinstance(r[0], tuple) and r[0][0] == "eac128":
                runs.append(decode_spill_run128(r[0][1], r[0][2]))
            else:
                runs.append(r)
        n_out = int(self.live_scalars[-1]) if self.live_scalars else 0
        self._check_live()
        runs.append(self._pull(self.spec, n_out))
        while len(runs) > 1:
            runs.sort(key=lambda r: len(r[0]))
            a, b = runs.pop(0), runs.pop(0)
            runs.append(_host_merge(a, b))
        return runs[0]

    def finish(self):
        """-> (lo u64, hi u64, counts i64), sorted by (hi, lo)."""
        self._flush()
        if self.spec is None:
            z = np.zeros(0, np.uint64)
            return z, z.copy(), np.zeros(0, np.int64)
        if self.host_runs:
            return self._merged_host()
        n_out = int(self.live_scalars[-1]) if self.live_scalars else 0
        self._check_live()
        return self._pull(self.spec, n_out)

    def finish_expanded(self):
        """Symmetric fwd+rc edge spectrum (build-graph semantics)."""
        self._flush()
        if self.spec is None:
            z = np.zeros(0, np.uint64)
            return z, z.copy(), np.zeros(0, np.int64)
        if self.host_runs:
            from ..core import kmer as KK

            lo, hi, c = self._merged_host()
            rlo, rhi = KK.reverse_complement(lo, hi, self.rho)
            pal = (rlo == lo) & (rhi == hi)
            out_lo = np.concatenate([lo, rlo[~pal]])
            out_hi = np.concatenate([hi, rhi[~pal]])
            out_c = np.concatenate([np.where(pal, c * 2, c), c[~pal]])
            order = np.lexsort((out_lo, out_hi))
            return out_lo[order], out_hi[order], out_c[order]
        out = expand_step_wide(*self.spec, self.rho)
        n_out = int(out[5])
        self._check_live()
        return self._pull(out[:5], n_out)
