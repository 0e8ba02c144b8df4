"""Bisect classify v2's device phases. Usage: python scripts/probe_v2_phases.py"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import gossamer_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from functools import partial

from gossamer_tpu.ops.engine import _kmerize_words, canon_value

k = 25
C = 1 << 22
T = 101
max_reads = C // T
nk = T - k
NQ = max_reads * nk
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 1 << 32, C // 16 + 2, np.int64).astype(np.uint32))
NS = 1 << 21
sh = jnp.asarray(np.sort(rng.integers(0, 1 << 20, NS, np.uint32)))
sl = jnp.asarray(rng.integers(0, 1 << 32, NS, np.uint32))


@jax.jit
def phase_a(words):
    l1, l0 = _kmerize_words(words, k, C)
    l1 = l1.T.reshape(-1)
    l0 = l0.T.reshape(-1)
    q1 = l1[: max_reads * T].reshape(max_reads, T)[:, :nk].reshape(-1)
    q0 = l0[: max_reads * T].reshape(max_reads, T)[:, :nk].reshape(-1)
    n1, n0 = canon_value(q1, q0, k)
    qh = (n1 << jnp.uint32(2)) | (n0 >> jnp.uint32(30))
    ql = (n0 << jnp.uint32(2)) | jnp.uint32(3)
    return qh, ql


@jax.jit
def phase_a_nat(words):
    # phase-major kept (no transpose): is the transpose the hog?
    l1, l0 = _kmerize_words(words, k, C)
    l1 = l1.reshape(-1)[:NQ]
    l0 = l0.reshape(-1)[:NQ]
    n1, n0 = canon_value(l1, l0, k)
    return n1, n0


@jax.jit
def phase_b(qh, ql):
    rid = jax.lax.broadcasted_iota(jnp.int32, (max_reads, nk), 0).reshape(-1)
    eh = jnp.concatenate([sh, qh])
    el = jnp.concatenate([sl, ql])
    ridp = jnp.concatenate([jnp.full((NS,), -1, jnp.int32), rid])
    return jax.lax.sort((eh, el, ridp), num_keys=2)


@jax.jit
def phase_c(eh, el, ridp):
    n = eh.shape[0]
    new_key = jnp.ones((n,), bool).at[1:].set(
        (eh[1:] != eh[:-1]) | ((el[1:] >> 2) != (el[:-1] >> 2)))
    seg = jnp.cumsum(new_key.astype(jnp.int32)) - 1
    is_set = ridp < 0
    fcode = jnp.where(is_set, seg * 8 + (el & 3).astype(jnp.int32) + 1, 0)
    m = jax.lax.cummax(fcode)
    match = ~is_set & (m > seg * 8)
    bits = jnp.where(match, jnp.int32(1) << jnp.clip((m & 7) - 1, 0, 3), 0)
    agg = jnp.where(is_set, jnp.uint32(0xFFFFFFFF),
                    (ridp.astype(jnp.uint32) << jnp.uint32(4))
                    | bits.astype(jnp.uint32))
    return agg


@jax.jit
def phase_d(agg):
    return jax.lax.sort(agg)


@jax.jit
def phase_e(agg):
    q = agg[:NQ].reshape(max_reads, nk)
    pad = 128 - nk
    q = jnp.concatenate([q, jnp.zeros((max_reads, pad), jnp.uint32)], axis=1)
    while q.shape[1] > 1:
        h = q.shape[1] // 2
        q = q[:, :h] | q[:, h:]
    return (q[:, 0] & jnp.uint32(15)).astype(jnp.uint8)


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    force(out)
    best = None
    for _ in range(reps):
        t0 = time.time()
        force(fn(*args))
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"# {label}: {best*1e3:.1f} ms", file=sys.stderr)
    return out


qhql = timeit("A kmerize+transpose+slice+canon", phase_a, words)
timeit("A' kmerize+canon (no transpose)", phase_a_nat, words)
srt = timeit("B join sort (set+q, 2key+pay)", phase_b, *qhql)
agg = timeit("C scans", phase_c, *srt)
agg2 = timeit("D agg 1-plane sort", phase_d, agg)
timeit("E reshape OR-tree", phase_e, agg2)


@jax.jit
def fused_plain(words):
    qh, ql = phase_a.__wrapped__(words)
    s = phase_b.__wrapped__(qh, ql)
    agg = phase_c.__wrapped__(*s)
    agg2 = phase_d.__wrapped__(agg)
    return phase_e.__wrapped__(agg2)


@jax.jit
def fused_barrier(words):
    qh, ql = phase_a.__wrapped__(words)
    qh, ql = jax.lax.optimization_barrier((qh, ql))
    s = phase_b.__wrapped__(qh, ql)
    s = jax.lax.optimization_barrier(s)
    agg = phase_c.__wrapped__(*s)
    agg = jax.lax.optimization_barrier(agg)
    agg2 = phase_d.__wrapped__(agg)
    agg2 = jax.lax.optimization_barrier(agg2)
    return phase_e.__wrapped__(agg2)


timeit("FUSED plain", fused_plain, words)
timeit("FUSED with barriers", fused_barrier, words)
