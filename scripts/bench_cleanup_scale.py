"""Cleanup-pass scaling: 20M-edge graph through pop-bubbles/prune-tips.

Round-3 VERDICT done-criterion: "a >= 20M-edge synthetic completes in
minutes, same trim decisions" (TourBus pass 2 was a per-start-node
host Dijkstra over Python bigints; round 4 runs it on integer group
ids with native rank/chain kernels).

The graph is synthesized directly as a spectrum (10 Mbp genome at 30x
with 2000 SNP bubble branches at 5x) so the test measures the CLEANUP
passes, not counting.

Usage: python scripts/bench_cleanup_scale.py [--mbp 10]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from gossamer_tpu.core import kmer as K  # noqa: E402
from gossamer_tpu.graph.graph import Graph  # noqa: E402


def windows_u64(codes: np.ndarray, rho: int) -> np.ndarray:
    from gossamer_tpu.io.native import native_kmerize_u64

    lo, valid = native_kmerize_u64(codes, rho)
    return lo[valid.astype(bool)]


def main():
    mbp = 10.0
    if "--mbp" in sys.argv:
        mbp = float(sys.argv[sys.argv.index("--mbp") + 1])
    k = 25
    rho = k + 1
    rng = np.random.default_rng(44)
    glen = int(mbp * 1e6)
    genome = rng.integers(0, 4, size=glen, dtype=np.uint8)

    t0 = time.time()
    fwd = windows_u64(genome, rho)
    # bubble branches: 2*rho+1-base segments with a SNP in the middle
    n_bub = 2000
    seg = 2 * rho + 1
    starts = rng.integers(0, glen - seg, size=n_bub)
    muts = []
    for s in starts:
        m = genome[s : s + seg].copy()
        m[seg // 2] = (m[seg // 2] + 1 + rng.integers(0, 3)) % 4
        muts.append(m)
        muts.append(np.array([255], np.uint8))
    mut_lo = windows_u64(np.concatenate(muts), rho)

    lo = np.concatenate([fwd, mut_lo])
    c = np.concatenate([np.full(len(fwd), 30, np.int64),
                        np.full(len(mut_lo), 3, np.int64)])
    rlo, _ = K.reverse_complement(lo, np.zeros_like(lo), rho)
    lo = np.concatenate([lo, rlo])
    c = np.concatenate([c, c])
    order = np.argsort(lo, kind="stable")
    lo, c = lo[order], c[order]
    new = np.ones(len(lo), bool)
    new[1:] = lo[1:] != lo[:-1]
    idx = np.cumsum(new) - 1
    cc = np.zeros(int(idx[-1]) + 1, np.int64)
    np.add.at(cc, idx, c)
    lo = lo[new]
    g = Graph(k, lo, np.zeros_like(lo), cc)
    print(f"# synth {time.time()-t0:.1f}s: {g.count/1e6:.1f}M edges",
          flush=True)

    from gossamer_tpu.algo.tour_bus import pop_bubbles

    t0 = time.time()
    g2, popped = pop_bubbles(g)
    dt_pop = time.time() - t0
    print(f"# pop-bubbles: {dt_pop:.1f}s popped={popped} "
          f"removed={g.count - g2.count} edges", flush=True)

    from gossamer_tpu.algo.cleanup import prune_tips

    t0 = time.time()
    g3 = prune_tips(g2, iterations=2)
    print(f"# prune-tips x2: {time.time()-t0:.1f}s "
          f"removed={g2.count - g3.count} edges", flush=True)


if __name__ == "__main__":
    main()
