"""Graph cleanup: trim-graph and prune-tips.

Semantics tracked from ``src/GossCmdTrimGraph.cc`` and
``src/GossCmdPruneTips.cc:69-344``.  The reference walks each in-degree-0
tip sequentially per thread; here tip candidacy, attach-node sibling
coverage checks and zapping are evaluated for *all* tips at once over the
vectorized segment decomposition.

One deliberate deviation: the reference's absolute-cutoff check reads
``c < mRelCutoff.get()`` under the ``cutoff`` gate
(``GossCmdPruneTips.cc:171``) — comparing a coverage against the wrong
option is a latent bug there (inactive in default runs); we implement the
documented intent ``c < cutoff``.
"""

from __future__ import annotations

import numpy as np

from ..graph.graph import Graph
from ..graph.segments import decompose

U64 = np.uint64


def trim_graph(g: Graph, cutoff: int) -> Graph:
    """Drop edges with multiplicity < cutoff (``GossCmdTrimGraph.cc``)."""
    dead = g.counts < cutoff
    return g.remove_edges(dead)


def prune_tips_once(
    g: Graph,
    cutoff: int | None = None,
    relative_cutoff: float | None = None,
) -> tuple[Graph, int, int]:
    """One prune-tips pass. Returns (new_graph, tips_removed, edges_zapped)."""
    n = g.count
    if n == 0:
        return g, 0, 0
    dec = decompose(g)
    if len(dec.seg_start) == 0:
        return g, 0, 0

    heads = dec.seg_start  # chain head edge ranks, ascending
    ends = dec.order[dec.seg_off + dec.seg_len - 1]  # chain end edge ranks
    seg_len = dec.seg_len

    hfrom = g.from_node(g.lo[heads], g.hi[heads])
    start_ok = g.in_degree(*hfrom) == 0  # tips start at in-degree-0 nodes
    tip_len_ok = seg_len <= 2 * g.k

    beg_out = g.out_degree(*hfrom)
    tto = g.to_node(g.lo[ends], g.hi[ends])
    end_in = g.in_degree(*tto)
    end_out = g.out_degree(*tto)

    beg_con = beg_out > 1  # (in-degree is 0 for candidates)
    end_con = (end_in > 1) | (end_out > 0)

    joined_end = ~beg_con & end_con
    joined_beg = beg_con & ~end_con
    cand = start_ok & tip_len_ok & (joined_end | joined_beg)

    # attach node + representative coverage per candidate
    c_cov = np.where(joined_end, g.counts[ends], g.counts[heads]).astype(np.int64)
    rc_to = g.node_rc(*tto)
    att_lo = np.where(joined_end, rc_to[0], hfrom[0])
    att_hi = np.where(joined_end, rc_to[1], hfrom[1])

    if cutoff is not None and cutoff > 0:
        cand &= c_cov >= cutoff

    # sibling coverage over the attach node's out-edges (degree <= 4)
    r0, r1 = g.begin_end_rank(att_lo, att_hi)
    ok = np.ones(len(heads), dtype=bool)
    total = np.zeros(len(heads), dtype=np.int64)
    for j in range(4):
        idx = r0 + j
        live = idx < r1
        safe = np.minimum(idx, n - 1)
        cov = g.counts[safe]
        total += np.where(live, cov, 0)
        ok &= ~(live & (cov < c_cov))
    cand &= ok
    if relative_cutoff is not None and relative_cutoff > 0:
        cand &= ~(c_cov < total * relative_cutoff)

    if not cand.any():
        return g, 0, 0

    # zap all edges of qualifying chains + their reverse complements
    qualify = np.zeros(n, dtype=bool)
    qualify[heads[cand]] = True
    zap = np.zeros(n, dtype=bool)
    member = qualify[dec.start] & ~dec.cyclic
    zap[member] = True
    rc_ranks = g.edge_rc_rank()
    zap[rc_ranks[member]] = True

    tips = int(cand.sum())
    zapped = int(zap.sum())
    return g.remove_edges(zap), tips, zapped


def prune_tips(
    g: Graph,
    iterations: int = 1,
    cutoff: int | None = None,
    relative_cutoff: float | None = None,
    log=None,
) -> Graph:
    for it in range(iterations):
        g, tips, zapped = prune_tips_once(g, cutoff, relative_cutoff)
        if log is not None:
            log("info", f"prune-tips pass {it + 1}: removed {tips} tips ({zapped} edges)")
        if tips == 0:
            break
    return g
