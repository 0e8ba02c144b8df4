"""Pallas TPU kernel: streaming 2-way merge of sorted u32-plane runs.

First building block of the round-2 merge-fold kernel (docs/design.md
§"Round-2 kernel plan").  Merges two ascending-sorted runs of
(l1, l0, c) lanes in ONE pass over HBM — the memory-bound replacement
for XLA's concat + 2-key sort when one side is already sorted (the
running spectrum) and the other was just sorted (the batch).

Algorithm (classical tile-lookahead merge, e.g. GPU merge sorts):
keep the next tile of each run prefetched in VMEM; per step consume the
tile whose head is smaller, bitonic-merge it with the carry tile (both
sorted, so log2(2T) compare-exchange stages suffice), emit the lower
half, keep the upper half as the new carry.  Cursors advance by whole
tiles, so every DMA is tile-aligned (traced unaligned offsets do not
legalize on this platform).  Runs are padded with all-ones sentinel
lanes; sentinels sort to the tail and are trimmed by the caller.

Lexicographic key = (l1, l0); the count plane rides along.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT32 = 0xFFFFFFFF
LANES = 128
ROWS = 128
TILE = ROWS * LANES  # 1024 lanes per step


def _flat_reverse(x):
    """Reverse flat order of a (R, 128) tile.  Mosaic has no `rev`
    lowering, so reverse = XOR-with-all-ones = a cascade of XOR-butterfly
    exchanges (out[i] = x[i^d]), each two rolls + a select."""
    rows = x.shape[0]
    d = 1
    while d < LANES:
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        upper = (lane & d) != 0
        x = jnp.where(upper, jnp.roll(x, d, 1), jnp.roll(x, -d, 1))
        d *= 2
    d = 1
    while d < rows:
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        upper = (row & d) != 0
        x = jnp.where(upper, jnp.roll(x, d, 0), jnp.roll(x, -d, 0))
        d *= 2
    return x


def _cmp_lt(a1, a0, b1, b0):
    return (a1 < b1) | ((a1 == b1) & (a0 < b0))


def _bitonic_merge(l1, l0, c):
    """(2T,) flat-ordered planes shaped (2*ROWS, LANES), where the first
    half is ascending and the second half is descending (a bitonic
    sequence) -> fully ascending."""
    rows = l1.shape[0]
    total = rows * LANES
    d = total // 2
    while d >= 1:
        if d >= LANES:
            rd = d // LANES
            # butterfly across rows: partner row = row ^ rd
            p1 = jnp.roll(l1, -rd, 0)
            p0 = jnp.roll(l0, -rd, 0)
            pc = jnp.roll(c, -rd, 0)
            q1 = jnp.roll(l1, rd, 0)
            q0 = jnp.roll(l0, rd, 0)
            qc = jnp.roll(c, rd, 0)
            row = jax.lax.broadcasted_iota(jnp.int32, l1.shape, 0)
            upper = (row & rd) != 0
            o1 = jnp.where(upper, q1, p1)
            o0 = jnp.where(upper, q0, p0)
            oc = jnp.where(upper, qc, pc)
        else:
            p1 = jnp.roll(l1, -d, 1)
            p0 = jnp.roll(l0, -d, 1)
            pc = jnp.roll(c, -d, 1)
            q1 = jnp.roll(l1, d, 1)
            q0 = jnp.roll(l0, d, 1)
            qc = jnp.roll(c, d, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, l1.shape, 1)
            upper = (lane & d) != 0
            o1 = jnp.where(upper, q1, p1)
            o0 = jnp.where(upper, q0, p0)
            oc = jnp.where(upper, qc, pc)
        # ascending network: lower position keeps min, upper keeps max.
        # Each pair must decide from ONE comparison: lower takes partner
        # iff partner < self, upper iff partner > self — the SAME
        # predicate evaluated from both ends, so the pair either swaps or
        # holds.  (An earlier `!(partner < self)` at the upper lane took
        # the partner on EQUAL keys too, duplicating one payload and
        # dropping the other — only visible when equal keys carry
        # distinct counts.)
        # expressed with and/or/not — selects and xors over bool vectors
        # lower through an i8 trunc Mosaic rejects
        part_lt = _cmp_lt(o1, o0, l1, l0)
        part_gt = _cmp_lt(l1, l0, o1, o0)
        take_partner = (part_gt & upper) | (part_lt & jnp.logical_not(upper))
        l1 = jnp.where(take_partner, o1, l1)
        l0_new = jnp.where(take_partner, o0, l0)
        c = jnp.where(take_partner, oc, c)
        l0 = l0_new
        d //= 2
    return l1, l0, c


def _merge_kernel(a1_hbm, a0_hbm, ac_hbm, b1_hbm, b0_hbm, bc_hbm,
                  o1_hbm, o0_hbm, oc_hbm,
                  carry, abuf, bbuf, cur, sem):
    """Sequential grid over output tiles; see module docstring.

    carry: VMEM (3, ROWS, LANES); abuf/bbuf: VMEM (3, ROWS, LANES)
    prefetched next tiles; cur: SMEM [ia, ib] tile cursors; 6 DMA sems.
    """
    t = pl.program_id(0)
    steps = pl.num_programs(0)
    na = a1_hbm.shape[0] // ROWS
    nb = b1_hbm.shape[0] // ROWS

    def load(run_refs, buf, slot, tile_idx):
        for i, ref in enumerate(run_refs):
            # x64 mode makes bare python ints i64; memref indices need i32
            dma = pltpu.make_async_copy(
                ref.at[pl.ds(tile_idx * ROWS, ROWS), :],
                buf.at[jnp.int32(i)], sem.at[jnp.int32(slot * 3 + i)])
            dma.start()
            dma.wait()

    @pl.when(t == 0)
    def _init():
        cur[0] = 0
        cur[1] = 0
        load((a1_hbm, a0_hbm, ac_hbm), abuf, 0, 0)
        load((b1_hbm, b0_hbm, bc_hbm), bbuf, 1, 0)
        # carry starts as all-sentinel (empty)
        carry[0] = jnp.full((ROWS, LANES), SENT32, jnp.uint32)
        carry[1] = jnp.full((ROWS, LANES), SENT32, jnp.uint32)
        carry[2] = jnp.zeros((ROWS, LANES), jnp.uint32)

    ia = cur[0]
    ib = cur[1]
    # choose the run with the smaller head (sentinel-padded, so an
    # exhausted run always has a sentinel head).  At the final step both
    # buffers are sentinels and the merge just flushes the carry.
    ah1 = abuf[0][0, 0]
    ah0 = abuf[1][0, 0]
    bh1 = bbuf[0][0, 0]
    bh0 = bbuf[1][0, 0]
    take_a = (ah1 < bh1) | ((ah1 == bh1) & (ah0 <= bh0))

    x1 = jnp.where(take_a, abuf[0], bbuf[0])
    x0 = jnp.where(take_a, abuf[1], bbuf[1])
    xc = jnp.where(take_a, abuf[2], bbuf[2])

    # carry (asc) ++ reversed(tile) (desc) is bitonic over 2T lanes
    m1 = jnp.concatenate([carry[0], _flat_reverse(x1)], 0)
    m0 = jnp.concatenate([carry[1], _flat_reverse(x0)], 0)
    mc = jnp.concatenate([carry[2], _flat_reverse(xc)], 0)
    m1, m0, mc = _bitonic_merge(m1, m0, mc)

    # consume-only first step: the merged lower half (the consumed tile)
    # becomes the carry; emissions lag consumption by one step
    @pl.when(t == 0)
    def _():
        carry[0] = m1[:ROWS]
        carry[1] = m0[:ROWS]
        carry[2] = mc[:ROWS]

    @pl.when(t > 0)
    def _():
        o1_hbm[...] = m1[:ROWS]
        o0_hbm[...] = m0[:ROWS]
        oc_hbm[...] = mc[:ROWS]
        carry[0] = m1[ROWS:]
        carry[1] = m0[ROWS:]
        carry[2] = mc[ROWS:]

    # advance the consumed run and prefetch (unless this was the last step:
    # the final carry is full of sentinels by construction)
    @pl.when((t + 1 < steps) & take_a)
    def _():
        nxt = ia + 1
        cur[0] = nxt

        @pl.when(nxt < na)
        def _():
            load((a1_hbm, a0_hbm, ac_hbm), abuf, 0, nxt)

        @pl.when(nxt >= na)
        def _():
            abuf[0] = jnp.full((ROWS, LANES), SENT32, jnp.uint32)
            abuf[1] = jnp.full((ROWS, LANES), SENT32, jnp.uint32)
            abuf[2] = jnp.zeros((ROWS, LANES), jnp.uint32)

    @pl.when((t + 1 < steps) & jnp.logical_not(take_a))
    def _():
        nxt = ib + 1
        cur[1] = nxt

        @pl.when(nxt < nb)
        def _():
            load((b1_hbm, b0_hbm, bc_hbm), bbuf, 1, nxt)

        @pl.when(nxt >= nb)
        def _():
            bbuf[0] = jnp.full((ROWS, LANES), SENT32, jnp.uint32)
            bbuf[1] = jnp.full((ROWS, LANES), SENT32, jnp.uint32)
            bbuf[2] = jnp.zeros((ROWS, LANES), jnp.uint32)


@partial(jax.jit, static_argnums=(6,))
def merge_sorted_planes(a1, a0, ac, b1, b0, bc, interpret: bool = False):
    """Merge sorted sentinel-padded runs -> sorted planes of nA+nB lanes.

    All inputs 1-D uint32, lengths multiples of TILE (pad with sentinel
    keys / zero counts).  Keys ordered lexicographically by (l1, l0).
    """
    na, nb = a1.shape[0], b1.shape[0]
    assert na % TILE == 0 and nb % TILE == 0
    if na == 0:
        return b1, b0, bc
    if nb == 0:
        return a1, a0, ac
    n = na + nb
    steps = n // TILE + 1  # emissions lag consumption by one step

    def as2d(x):
        return x.reshape(-1, LANES)

    out = pl.pallas_call(
        _merge_kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[
            pl.BlockSpec(
                (ROWS, LANES),
                # literals promote to i64 under x64; Mosaic wants i32
                lambda t: (jnp.maximum(t - 1, 0).astype(jnp.int32),
                           jnp.int32(0)),
                memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((3, ROWS, LANES), jnp.uint32),
            pltpu.VMEM((3, ROWS, LANES), jnp.uint32),
            pltpu.VMEM((3, ROWS, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(as2d(a1), as2d(a0), as2d(ac), as2d(b1), as2d(b0), as2d(bc))
    return tuple(x.reshape(-1) for x in out)
