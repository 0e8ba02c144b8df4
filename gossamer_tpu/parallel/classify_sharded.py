"""Multi-chip read classification: annotated-set sharding over a mesh.

The xenome classifier's scale story on one device is multipass — slice
an index larger than memory and OR the per-slice class bitmaps
(``classify/xenome.py:ann_slices``, reference
``src/GossCmdGroupReads.cc:381-468`` + docs/xenome.md multipass).  On a
mesh the same decomposition runs in SPACE instead of time: shard ``s``
holds the s-th slice of the sorted annotated set, reads are replicated
(they are tiny next to the index), every chip runs the sort-join
classify batch against its slice, and one ``all_gather`` ORs the
per-shard blrg bitmaps — bit-exact with the single-device result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..classify.device import classify_batch

MAXU64 = 0xFFFFFFFFFFFFFFFF


def _gput(mesh: Mesh, arr: np.ndarray, spec):
    """Host array -> mesh array under ``spec``; multi-process safe
    (each process materializes only its addressable shards; replicated
    specs hand every process the whole array)."""
    if jax.process_count() == 1:
        return jnp.asarray(arr)
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh,
                                        lambda idx: arr[idx])


def shard_set(set_E: np.ndarray, n: int) -> np.ndarray:
    """Split the sorted E plane into n contiguous slices, sentinel-padded
    to equal length -> (n, m) array.  Sentinel entries cannot match any
    query (query keys are < 2^62)."""
    m = -(-len(set_E) // n)
    out = np.full((n, m), MAXU64, np.uint64)
    for s in range(n):
        part = set_E[s * m : (s + 1) * m]
        out[s, : len(part)] = part
    return out


def make_sharded_classify(mesh: Mesh, k: int, window: int, max_reads: int):
    """Jitted (codes uint8[W+k-1], set_shards uint64[n, m]) ->
    blrg uint8[max_reads] (replicated)."""

    def local(codes, set_shard):
        blrg = classify_batch(codes, set_shard[0], k, max_reads)
        every = jax.lax.all_gather(blrg, "d")  # (n, max_reads)
        out = every[0]
        for i in range(1, mesh.devices.size):
            out = out | every[i]
        return out

    step = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("d", None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(step)


def make_ring_classify(mesh: Mesh, k: int, window: int, max_reads: int):
    """Ring read-rotation classify (SURVEY.md §5 long-context analog):
    every chip keeps its set slice RESIDENT and classifies its OWN read
    block, then the blocks (with their accumulated blrg bitmaps) rotate
    around the ring via ``ppermute`` until each block has met every
    slice — N read blocks in flight per cycle instead of one broadcast
    block, the data-parallel counterpart of the reference's serial
    multipass (``src/GossCmdGroupReads.cc:417-429``).

    Jitted (codes uint8[n, W+k-1], set_shards uint64[n, m]) ->
    blrg uint8[n, max_reads], block i's results on row i."""
    n = mesh.devices.size
    perm = [(i, (i + 1) % n) for i in range(n)]

    def local(codes, set_shard):
        cur = codes[0]
        acc = classify_batch(cur, set_shard[0], k, max_reads)
        for _ in range(n - 1):
            cur = jax.lax.ppermute(cur, "d", perm)
            acc = jax.lax.ppermute(acc, "d", perm)
            acc = acc | classify_batch(cur, set_shard[0], k, max_reads)
        # one more hop carries each block's finished blrg home
        acc = jax.lax.ppermute(acc, "d", perm)
        return acc[None]

    step = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("d"), P("d", None)),
        out_specs=P("d"),
        check_vma=False,
    )
    return jax.jit(step)


class ShardedClassifier:
    """Driver: same call shape as ``classify_codes_device`` but with the
    annotated set sharded across the mesh."""

    def __init__(self, mesh: Mesh, set_E: np.ndarray, k: int,
                 window: int = 1 << 20):
        self.mesh = mesh
        self.k = k
        self.window = window
        # fixed read capacity -> ONE compiled program (per-batch read
        # counts would each trigger a fresh multi-chip compile); the
        # fill loop flushes on read count so the bound always holds
        self.max_reads = max(256, window // 32)
        self.shards = _gput(mesh, shard_set(set_E, mesh.devices.size),
                            P("d", None))
        self._step = make_sharded_classify(mesh, k, window, self.max_reads)

    def classify_codes(self, codes_list) -> np.ndarray:
        out_dev = []
        out_counts = []
        buf: list[np.ndarray] = []
        buf_len = 0

        def flush():
            parts = []
            for c in buf:
                parts.append(c)
                parts.append(np.array([255], np.uint8))
            flat = np.concatenate(parts)
            pad = self.window + self.k - 1 - len(flat)
            if pad < 0:
                raise ValueError("batch exceeds window; lower batch size")
            flat = np.concatenate([flat, np.full(pad, 255, np.uint8)])
            out_dev.append(self._step(_gput(self.mesh, flat, P()),
                                      self.shards))
            out_counts.append(len(buf))

        for c in codes_list:
            if ((buf_len + len(c) + 1 > self.window
                 or len(buf) >= self.max_reads) and buf):
                flush()
                buf, buf_len = [], 0
            buf.append(c)
            buf_len += len(c) + 1
        if buf:
            flush()
        if not out_dev:
            return np.zeros(0, np.uint8)
        pulled = jax.device_get(out_dev)
        return np.concatenate([p[:n] for p, n in zip(pulled, out_counts)])


class RingClassifier:
    """Driver for :func:`make_ring_classify`: N read blocks in flight
    per rotation cycle, read order preserved (block i = i-th window of
    the stream)."""

    def __init__(self, mesh: Mesh, set_E: np.ndarray, k: int,
                 window: int = 1 << 20):
        self.mesh = mesh
        self.k = k
        self.window = window
        self.max_reads = max(256, window // 32)
        self.shards = jnp.asarray(shard_set(set_E, mesh.devices.size))
        self._step = make_ring_classify(mesh, k, window, self.max_reads)

    def classify_codes(self, codes_list) -> np.ndarray:
        n = self.mesh.devices.size
        blocks: list[np.ndarray] = []
        counts: list[int] = []
        buf: list[np.ndarray] = []
        buf_len = 0

        def close_block():
            nonlocal buf, buf_len
            parts = []
            for c in buf:
                parts.append(c)
                parts.append(np.array([255], np.uint8))
            flat = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
            pad = self.window + self.k - 1 - len(flat)
            if pad < 0:
                raise ValueError("block exceeds window; lower block size")
            blocks.append(np.concatenate(
                [flat, np.full(pad, 255, np.uint8)]))
            counts.append(len(buf))
            buf, buf_len = [], 0

        for c in codes_list:
            if ((buf_len + len(c) + 1 > self.window
                 or len(buf) >= self.max_reads) and buf):
                close_block()
            buf.append(c)
            buf_len += len(c) + 1
        if buf:
            close_block()
        while len(blocks) % n:  # pad the last cycle with empty blocks
            close_block()
        out_dev = []
        for i in range(0, len(blocks), n):
            out_dev.append(self._step(
                jnp.asarray(np.stack(blocks[i : i + n])), self.shards))
        if not out_dev:
            return np.zeros(0, np.uint8)
        pulled = jax.device_get(out_dev)
        outs = []
        bi = 0
        for cycle in pulled:
            for row in cycle:
                if bi < len(counts) and counts[bi]:
                    outs.append(row[: counts[bi]])
                bi += 1
        return (np.concatenate(outs) if outs
                else np.zeros(0, np.uint8))
