"""Time classify v1 vs v2 on the real device at bench shapes.

Usage: python scripts/probe_classify_v2.py [windows...]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import bench as B  # noqa: F401  (path setup)
import gossamer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from gossamer_tpu.classify.device import (classify_periodic_stream,
                                          classify_periodic_stream2,
                                          encode_set)
from gossamer_tpu.io.stream import pack_chunk
from gossamer_tpu.ops.count import count_chunks


def main():
    k = 25
    rng = np.random.default_rng(7)
    glen = int(1e6)
    n_reads = 200_000
    read_len = 100
    genomes = [rng.integers(0, 4, size=glen, dtype=np.uint8)
               for _ in range(2)]
    sets = []
    for g in genomes:
        lo, hi, _ = count_chunks(iter([g]), k, both_strands=False,
                                 canonical=True, chunk=len(g) - k + 1)
        sets.append(lo)
    union = np.union1d(sets[0], sets[1])
    set_E = encode_set(union, np.isin(union, sets[0]),
                       np.isin(union, sets[1]))
    starts = rng.integers(0, glen - read_len, size=n_reads)
    codes = [genomes[i % 2][s : s + read_len]
             for i, s in enumerate(starts)]

    windows = [int(w) for w in sys.argv[1:]] or [22, 23]

    def pack_for(window):
        per = window // (read_len + 1)
        packed = []
        for base in range(0, n_reads, per):
            grp = codes[base : base + per]
            parts = []
            for c in grp:
                parts.append(c)
                parts.append(np.array([255], np.uint8))
            flat = np.concatenate(parts)
            pad = window + k - 1 - len(flat)
            flat = np.concatenate([flat, np.full(pad, 255, np.uint8)])
            packed.append((pack_chunk(flat, k, window)[0], len(grp)))
        return packed

    from gossamer_tpu.classify.device import prepare_set_value

    set_dev = jnp.asarray(set_E)
    prepared = prepare_set_value(set_E, k)
    for lw in windows:
        window = 1 << lw
        packed = pack_for(window)
        for name in ("v2", "v1"):
            if name == "v1" and lw != 22:
                continue
            if name == "v2":
                fn = lambda p: classify_periodic_stream2(
                    p, set_E, k, window, read_len, prepared=prepared)
            else:
                fn = lambda p: classify_periodic_stream(
                    p, set_dev, k, window, read_len)
            fn(packed[:1])
            best = None
            for _ in range(3):
                t0 = time.time()
                blrg = fn(packed)
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            assert len(blrg) == n_reads and blrg.max() > 0
            print(f"# {name} window=2^{lw} ({len(packed)} programs): "
                  f"{best*1e3:.0f} ms -> {n_reads/best/1e3:.0f}K reads/s",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
