"""Pallas TPU kernel: fused merge + dedup + pack of sorted u32-plane runs.

The round-2 merge-fold kernel (docs/design.md §"Round-2 kernel plan").
Replaces the engine batch step's sort-with-payload + group scans +
1-key pack sort (~480ms at bench shapes) with ONE streaming pass over
HBM: merge (sorted batch) with (packed spectrum), sum counts of equal
keys, and write the packed result plus a live-group count.

Reference analog: the AsyncMerge sum-on-equal-keys drain into
``Graph::Builder`` (``src/AsyncMerge.tcc:190-211``), re-aimed at
HBM-resident sorted runs instead of disk spill files.

Per grid step (sequential), building on the verified two-run tile merge
of ``pallas_merge.py``:

1. **merge**: consume the run tile with the smaller head, bitonic-merge
   with the carry, keep the upper half as the new carry; the lower half
   is this step's emitted tile (emissions lag consumption by one step).
2. **dedup**: work in a one-lane-lagged frame (``work[i] = emitted[i-1]``
   with the previous tile's last lane carried in SMEM) so every group
   boundary compares two known lanes.  A group ends at ``i`` iff
   ``work[i].key != emitted[i].key``.  Counts ride as the *global
   running sum* ``S`` (wrapped u32; per-group totals are adjacent
   differences of packed ``S``, exact mod 2^32).
3. **pack**: compact group-end lanes to the tile front with a
   distance-bit network: ``dist = pos - dest`` is non-decreasing over
   representatives, so moving every element with bit ``b`` of ``dist``
   set down by ``2^b`` (LSB to MSB) never collides.
4. **emit**: append packed lanes into a double-tile VMEM accumulator at
   a running cursor (dynamic flat roll + masked blend); whenever a full
   tile accumulates, convert ``S`` to per-group counts and DMA it to
   the output at the next tile-aligned offset.

The final step flushes the open group and the partial accumulator tile
(sentinel-padded) and returns the count of non-sentinel groups through
an SMEM output.  Output lanes beyond the flushed extent are
uninitialized; callers mask with ``lane < live``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_merge import (LANES, ROWS, SENT32, TILE, _bitonic_merge,
                           _flat_reverse)  # noqa: F401  (re-export for tests)

I32 = jnp.int32
U32 = jnp.uint32
_LOG_TILE = 14  # TILE = 2**14


def _lane(shape):
    return jax.lax.broadcasted_iota(I32, shape, 1)


def _row(shape):
    return jax.lax.broadcasted_iota(I32, shape, 0)


def _flat_iota(shape):
    return _row(shape) * LANES + _lane(shape)


def _sroll(x, shift: int, axis: int):
    """Static roll that skips no-op shifts: Mosaic lowers jnp.roll to
    slice+concat, and a shift of 0 mod size makes a zero-size vector."""
    shift %= x.shape[axis]
    return jnp.roll(x, shift, axis) if shift else x


def _flat_roll_down(x, d: int):
    """out[i] = x[(i + d) % n] in flat order, static d."""
    sl, sr = d % LANES, d // LANES
    if sl == 0:
        return _sroll(x, -sr, 0)
    y = jnp.roll(x, -sl, 1)
    return jnp.where(_lane(x.shape) < LANES - sl,
                     _sroll(y, -sr, 0), _sroll(y, -(sr + 1), 0))


def _flat_roll_up1(x):
    """out[i] = x[(i - 1) % n] in flat order."""
    y = jnp.roll(x, 1, 1)
    return jnp.where(_lane(x.shape) >= 1, y, jnp.roll(y, 1, 0))


def _flat_roll_up_dyn(x, s):
    """out[i] = x[(i - s) % n], traced s (0 <= s < rows*LANES).

    Traced shifts must go through ``pltpu.roll`` — jnp.roll on a traced
    shift lowers to dynamic_slice, which Mosaic has no rule for.
    i32 divisors: traced-i32 % python-int emits an i64 literal under
    x64, which Mosaic also refuses.
    """
    sl = s % jnp.int32(LANES)
    sr = s // jnp.int32(LANES)
    y = pltpu.roll(x, sl, 1)
    return jnp.where(_lane(x.shape) >= sl,
                     pltpu.roll(y, sr, 0), pltpu.roll(y, sr + 1, 0))


def _flat_cumsum(x):
    """Inclusive cumulative sum in flat order over an (R, 128) tile:
    lane scan + row-total replication + exclusive row-prefix fixup.
    Integer dtypes only (u32 wraps, which the S-difference trick needs).
    """
    lane = _lane(x.shape)
    row = _row(x.shape)
    zero = jnp.zeros_like(x)
    d = 1
    while d < LANES:
        x = x + jnp.where(lane >= d, jnp.roll(x, d, 1), zero)
        d *= 2
    # replicate each row's total (lane 127) across the row; OR-spreading
    # is exact because every copy within a row holds the same value
    v = jnp.where(lane == LANES - 1, x, zero)
    d = 1
    while d < LANES:
        v = v | jnp.roll(v, d, 1)
        d *= 2
    w = v
    d = 1
    while d < x.shape[0]:
        w = w + jnp.where(row >= d, jnp.roll(w, d, 0), zero)
        d *= 2
    return x + (w - v)


def _compact(planes, lv, dest, idx):
    """Move lanes with lv==1 to flat positions ``dest`` (strictly
    increasing over live lanes, dest[i] <= i).  Distance-bit network:
    dist = pos - dest is non-decreasing over live lanes, so per-bit
    moves land on distinct slots (see module docstring)."""
    one = jnp.ones_like(lv)
    dist = idx - dest
    for b in range(_LOG_TILE):
        d = 1 << b
        move = lv & ((dist >> b) & 1)
        recv = _flat_roll_down(move, d) == 1
        planes = [jnp.where(recv, _flat_roll_down(p, d), p) for p in planes]
        dist = jnp.where(recv, _flat_roll_down(dist, d) - d, dist)
        lv = jnp.where(recv, one, lv & (1 - move))
    return planes


def _fold_kernel(a1_hbm, a0_hbm, ac_hbm, b1_hbm, b0_hbm, bc_hbm,
                 o1_hbm, o0_hbm, oc_hbm, live_out,
                 carry, abuf, bbuf, ebuf, ibuf, acc, obuf, st, su, sem):
    """st (SMEM i32): [ia, ib, pend, out_tile, live];
    su (SMEM u32): [carry_key1, carry_key0, running_total, prev_S]."""
    t = pl.program_id(0)
    steps = pl.num_programs(0)
    na = a1_hbm.shape[0] // ROWS
    nb = b1_hbm.shape[0] // ROWS
    sent = U32(SENT32)

    def load(run_refs, buf, slot, tile_idx):
        for i, ref in enumerate(run_refs):
            dma = pltpu.make_async_copy(
                ref.at[pl.ds(tile_idx * ROWS, ROWS), :],
                buf.at[jnp.int32(i)], sem.at[jnp.int32(slot * 3 + i)])
            dma.start()
            dma.wait()

    def store_tile(k1, k0, c, tile_idx):
        obuf[0] = k1
        obuf[1] = k0
        obuf[2] = c
        for i, ref in enumerate((o1_hbm, o0_hbm, oc_hbm)):
            dma = pltpu.make_async_copy(
                obuf.at[jnp.int32(i)],
                ref.at[pl.ds(tile_idx * ROWS, ROWS), :],
                sem.at[jnp.int32(6 + i)])
            dma.start()
            dma.wait()

    @pl.when(t == 0)
    def _init():
        st[0] = 0
        st[1] = 0
        st[2] = 0  # pend lanes in acc
        st[3] = 0  # next output tile
        st[4] = 0  # live (non-sentinel) groups
        su[0] = sent  # carried last key (phantom until first tile)
        su[1] = sent
        su[2] = U32(0)  # running count total through carried lane
        su[3] = U32(0)  # S at the last lane of the last emitted out-tile
        load((a1_hbm, a0_hbm, ac_hbm), abuf, 0, 0)
        load((b1_hbm, b0_hbm, bc_hbm), bbuf, 1, 0)
        carry[0] = jnp.full((ROWS, LANES), SENT32, U32)
        carry[1] = jnp.full((ROWS, LANES), SENT32, U32)
        carry[2] = jnp.zeros((ROWS, LANES), U32)

    # ---- merge: pallas_merge structure, but consumed tiles arrive
    # PRE-REVERSED (descending flat order, relayout done by XLA in the
    # wrapper at memcpy speed) so the 14-stage in-kernel _flat_reverse
    # is gone — carry ++ tile is directly bitonic.  A tile's head (its
    # minimum) therefore sits at the LAST flat position.
    ia = st[0]
    ib = st[1]
    ah1 = abuf[0][ROWS - 1, LANES - 1]
    ah0 = abuf[1][ROWS - 1, LANES - 1]
    bh1 = bbuf[0][ROWS - 1, LANES - 1]
    bh0 = bbuf[1][ROWS - 1, LANES - 1]
    take_a = (ah1 < bh1) | ((ah1 == bh1) & (ah0 <= bh0))

    x1 = jnp.where(take_a, abuf[0], bbuf[0])
    x0 = jnp.where(take_a, abuf[1], bbuf[1])
    xc = jnp.where(take_a, abuf[2], bbuf[2])

    m1 = jnp.concatenate([carry[0], x1], 0)
    m0 = jnp.concatenate([carry[1], x0], 0)
    mc = jnp.concatenate([carry[2], xc], 0)
    m1, m0, mc = _bitonic_merge(m1, m0, mc)

    @pl.when(t == 0)
    def _():
        carry[0] = m1[:ROWS]
        carry[1] = m0[:ROWS]
        carry[2] = mc[:ROWS]

    # ---- fold: dedup + pack + accumulate the emitted tile ----
    @pl.when(t > 0)
    def _fold():
        e1 = m1[:ROWS]
        e0 = m0[:ROWS]
        ec = mc[:ROWS]
        carry[0] = m1[ROWS:]
        carry[1] = m0[ROWS:]
        carry[2] = mc[ROWS:]

        shape = (ROWS, LANES)
        idx = _flat_iota(shape)
        ck1 = su[0]
        ck0 = su[1]
        tot = su[2]

        # one-lane-lagged work frame: work[i] = emitted[i-1], lane 0 is
        # the carried lane; every lane's successor is emitted[i].
        w1 = jnp.where(idx == 0, ck1, _flat_roll_up1(e1))
        w0 = jnp.where(idx == 0, ck0, _flat_roll_up1(e0))
        P = _flat_cumsum(ec)
        Sw = jnp.where(idx == 0, U32(0), _flat_roll_up1(P)) + tot

        is_last = (w1 != e1) | (w0 != e0)
        # the phantom initial carry must not close a group (its count
        # contribution is zero, so merging it into the first real group
        # is exact)
        is_last = is_last & jnp.logical_not((idx == 0) & (t == 1))
        # bool->int via typed select: Mosaic's convert_element_type
        # lowering recurses forever on bool casts (and x64 weak ints)
        one, zero = jnp.int32(1), jnp.int32(0)
        il = jnp.where(is_last, one, zero)
        lv = jnp.where(is_last & ((w1 != sent) | (w0 != sent)), one, zero)

        # tile totals come from the cumsums' last lanes, NOT jnp.sum: a
        # scalar reduce lowers through Mosaic's proxy (an untyped
        # jnp.sum) that re-promotes i32 to i64 under x64 and fails.
        cum_il = _flat_cumsum(il)
        dest = cum_il - 1

        # persist this tile's last lane as the next carry; store via
        # scratch so the scalars read back from a ref
        ebuf[0] = e1
        ebuf[1] = e0
        ebuf[2] = P
        su[0] = ebuf[0][ROWS - 1, LANES - 1]
        su[1] = ebuf[1][ROWS - 1, LANES - 1]
        su[2] = tot + ebuf[2][ROWS - 1, LANES - 1]
        ibuf[0] = cum_il
        ibuf[1] = _flat_cumsum(lv)
        m = ibuf[0][ROWS - 1, LANES - 1]
        st[4] = st[4] + ibuf[1][ROWS - 1, LANES - 1]
        pk1, pk0, pS = _compact([w1, w0, Sw], il, dest, idx)

        # append [pend, pend+m) into the double-tile accumulator
        pend = st[2]
        idx2 = _flat_iota((2 * ROWS, LANES))
        zeros = jnp.zeros((ROWS, LANES), U32)
        span = (idx2 >= pend) & (idx2 < pend + m)
        for slot, p in enumerate((pk1, pk0, pS)):
            ext = jnp.concatenate([p, zeros], 0)
            acc[slot] = jnp.where(span, _flat_roll_up_dyn(ext, pend),
                                  acc[slot])
        pend_new = pend + m

        @pl.when(pend_new >= TILE)
        def _emit():
            ok1 = acc[0][:ROWS]
            ok0 = acc[1][:ROWS]
            oS = acc[2][:ROWS]
            prevS = su[3]
            c = oS - jnp.where(idx == 0, prevS, _flat_roll_up1(oS))
            su[3] = acc[2, ROWS - 1, LANES - 1]
            store_tile(ok1, ok0, c, st[3])
            st[3] = st[3] + 1
            st[2] = pend_new - TILE
            half = _row((2 * ROWS, LANES)) < ROWS
            for slot in range(3):
                acc[slot] = jnp.where(half, jnp.roll(acc[slot], -ROWS, 0),
                                      jnp.zeros((2 * ROWS, LANES), U32))

        @pl.when(pend_new < TILE)
        def _():
            st[2] = pend_new

    # ---- final step: flush the open group and the partial tile ----
    @pl.when(t == steps - 1)
    def _finish():
        pend = st[2]
        idx2 = _flat_iota((2 * ROWS, LANES))
        acc[0] = jnp.where(idx2 == pend, su[0], acc[0])
        acc[1] = jnp.where(idx2 == pend, su[1], acc[1])
        acc[2] = jnp.where(idx2 == pend, su[2], acc[2])
        st[4] = st[4] + jnp.where((su[0] != sent) | (su[1] != sent),
                                  jnp.int32(1), jnp.int32(0))
        pend = pend + 1

        shape = (ROWS, LANES)
        idx = _flat_iota(shape)
        keep = idx < pend
        ok1 = jnp.where(keep, acc[0][:ROWS], sent)
        ok0 = jnp.where(keep, acc[1][:ROWS], sent)
        oS = acc[2][:ROWS]
        c = oS - jnp.where(idx == 0, su[3], _flat_roll_up1(oS))
        c = jnp.where(keep, c, U32(0))
        store_tile(ok1, ok0, c, st[3])
        live_out[0, 0] = st[4]

    # ---- advance the consumed run, prefetch next tile ----
    @pl.when((t + 1 < steps) & take_a)
    def _():
        nxt = ia + 1
        st[0] = nxt

        @pl.when(nxt < na)
        def _():
            load((a1_hbm, a0_hbm, ac_hbm), abuf, 0, nxt)

        @pl.when(nxt >= na)
        def _():
            abuf[0] = jnp.full((ROWS, LANES), SENT32, U32)
            abuf[1] = jnp.full((ROWS, LANES), SENT32, U32)
            abuf[2] = jnp.zeros((ROWS, LANES), U32)

    @pl.when((t + 1 < steps) & jnp.logical_not(take_a))
    def _():
        nxt = ib + 1
        st[1] = nxt

        @pl.when(nxt < nb)
        def _():
            load((b1_hbm, b0_hbm, bc_hbm), bbuf, 1, nxt)

        @pl.when(nxt >= nb)
        def _():
            bbuf[0] = jnp.full((ROWS, LANES), SENT32, U32)
            bbuf[1] = jnp.full((ROWS, LANES), SENT32, U32)
            bbuf[2] = jnp.zeros((ROWS, LANES), U32)


@partial(jax.jit, static_argnums=(6,))
def merge_fold_planes(a1, a0, ac, b1, b0, bc, interpret: bool = False):
    """Merge two sorted sentinel-padded runs, summing counts of equal
    keys; return packed ascending planes plus the distinct non-sentinel
    key count.

    Inputs: 1-D uint32 planes, lengths nonzero multiples of TILE, keys
    (l1, l0) ascending with all-ones sentinels at the tail (counts 0).
    Returns ``(k1, k0, c, live)`` with planes of nA+nB lanes; lanes
    beyond the packed extent are unwritten — mask with ``lane < live``.
    """
    na, nb = a1.shape[0], b1.shape[0]
    assert na % TILE == 0 and nb % TILE == 0 and na > 0 and nb > 0
    n = na + nb
    steps = n // TILE + 1

    def as2d(x):
        # per-tile flat reverse (XLA relayout), then the kernel's 2-D
        # (ROWS, LANES) view — see the kernel's merge comment
        return x.reshape(-1, TILE)[:, ::-1].reshape(-1, LANES)

    out = pl.pallas_call(
        _fold_kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        # explicit i32 index map: the default returns python ints, which
        # become an i64 func.return under x64 that Mosaic rejects
        + [pl.BlockSpec((1, 1), lambda t: (jnp.int32(0), jnp.int32(0)),
                        memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((n // LANES, LANES), U32)] * 3
        + [jax.ShapeDtypeStruct((1, 1), I32)],
        scratch_shapes=[
            pltpu.VMEM((3, ROWS, LANES), U32),   # merge carry
            pltpu.VMEM((3, ROWS, LANES), U32),   # a prefetch
            pltpu.VMEM((3, ROWS, LANES), U32),   # b prefetch
            pltpu.VMEM((3, ROWS, LANES), U32),   # scalar-extraction stage
            pltpu.VMEM((2, ROWS, LANES), I32),   # i32 scalar extraction
            pltpu.VMEM((3, 2 * ROWS, LANES), U32),  # packed accumulator
            pltpu.VMEM((3, ROWS, LANES), U32),   # output stage
            pltpu.SMEM((8,), I32),
            pltpu.SMEM((4,), U32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        interpret=interpret,
    )(as2d(a1), as2d(a0), as2d(ac), as2d(b1), as2d(b0), as2d(bc))
    o1, o0, oc, live = out
    return (o1.reshape(-1), o0.reshape(-1), oc.reshape(-1), live[0, 0])
