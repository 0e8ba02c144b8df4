"""Micro-probe: which join primitive can hit 2.39M reads/s classify?

Times, on the real device, the candidate building blocks of the
classify join at bench shapes (200K reads -> ~20.2M windows, 2.0M-key
set):

  sortQ   — 2-key u32 sort of all query lanes + i32 payload (merge-join
            prerequisite)
  gather  — random u32 gather: idx[20M] into table[4M] (hash-probe
            cost unit; 2 probes/key for a cuckoo table)
  sort3   — the current engine's [set ++ queries] 3-key sort
  launch  — tiny jitted program round-trip (per-program overhead)

Usage: python scripts/probe_classify_prims.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import gossamer_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(label, fn, *args, reps=3):
    fn(*args)  # compile
    force(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.time()
        force(fn(*args))
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"# {label}: {best*1e3:.1f} ms", file=sys.stderr)
    return best


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    NQ = 1 << 24  # ~16.8M query lanes (bench: 20.2M)
    NS = 1 << 21  # 2M set lanes

    qh = jnp.asarray(rng.integers(0, 1 << 22, NQ, np.uint32))
    ql = jnp.asarray(rng.integers(0, 1 << 32, NQ, np.uint32))
    rid = jnp.asarray(rng.integers(0, 200_000, NQ, np.int32))
    sh = jnp.asarray(np.sort(rng.integers(0, 1 << 22, NS, np.uint32)))
    sl = jnp.asarray(rng.integers(0, 1 << 32, NS, np.uint32))

    @jax.jit
    def sortQ(qh, ql, rid):
        return jax.lax.sort((qh, ql, rid), num_keys=2)

    @jax.jit
    def sortQ_nopay(qh, ql):
        return jax.lax.sort((qh, ql), num_keys=2)

    @jax.jit
    def sort1(rid, ql):
        return jax.lax.sort((rid, ql), num_keys=1)

    idx = jnp.asarray(rng.integers(0, 1 << 22, NQ, np.uint32))
    table = jnp.asarray(rng.integers(0, 1 << 32, 1 << 22, np.uint32))

    @jax.jit
    def gather(table, idx):
        return jnp.take(table, idx.astype(jnp.int32))

    @jax.jit
    def sort3(sh, sl, qh, ql, rid):
        eh = jnp.concatenate([sh, qh])
        el = jnp.concatenate([sl, ql])
        isq = jnp.concatenate([jnp.zeros(NS, jnp.int32),
                               jnp.ones(NQ, jnp.int32)])
        r = jnp.concatenate([jnp.zeros(NS, jnp.int32), rid])
        return jax.lax.sort((eh, el, isq, r), num_keys=3)

    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros(128, jnp.int32)
    timeit("launch (tiny program)", tiny, x, reps=5)
    timeit(f"sortQ 2key+pay {NQ>>20}M", sortQ, qh, ql, rid)
    timeit(f"sortQ 2key nopay {NQ>>20}M", sortQ_nopay, qh, ql)
    timeit(f"sort1 1key+pay {NQ>>20}M", sort1, rid, ql)
    timeit(f"gather {NQ>>20}M from 4M-u32 table", gather, table, idx)
    timeit(f"sort3 [{NS>>20}M set ++ {NQ>>20}M q] 3key+pay",
           sort3, sh, sl, qh, ql, rid)

    # segmented OR via reshape (periodic rid): the aggregation if query
    # order is preserved
    bits = jnp.asarray(rng.integers(0, 16, NQ, np.int32))

    @jax.jit
    def seg_or(bits):
        r = bits.reshape(-1, 64)
        acc = r[:, 0]
        for i in range(1, 64):
            acc = acc | r[:, i]
        return acc

    @jax.jit
    def seg_or2(bits):
        r = bits.reshape(-1, 64)
        while r.shape[1] > 1:
            h = r.shape[1] // 2
            r = r[:, :h] | r[:, h:]
        return r[:, 0]

    timeit("seg-OR reshape-tree 64:1", seg_or2, bits)


if __name__ == "__main__":
    main()
