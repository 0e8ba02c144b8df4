"""Scaffolding: pair-library links between superpaths with gap estimates.

Functional counterpart of ``src/GossCmdBuildScaffold.cc`` +
``src/GossCmdScaffold.cc`` + ``src/ScaffoldGraph.{hh,cc}``: build-scaffold
maps a pair library onto a graph over SuperPathIds whose edges carry
(gap estimate, support count); scaffold linearizes it, joining superpaths
with N-gap paths.

The linearization here is the reference's core recipe (unique-successor
joins ordered by support, rc-mirror suppression); the reference's
additional component-ordering heuristics (near/mid/far placement,
``GossCmdScaffold.cc:328-446``) are refinement passes that can be added
behind the same artifact format.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Iterable

from ..graph.graph import Graph
from ..graph.supergraph import SuperGraph
from ..io.factory import FileFactory
from ..io.readers import Read
from .threading import PathIndex, UniquenessCache, collect_pair_links


class ScaffoldGraph:
    """links: (a, b) -> (count, gap_sum). Persisted as '-scaf' sidecars."""

    def __init__(self, insert_size: int, links: dict | None = None):
        self.insert_size = insert_size
        self.links: dict[tuple[int, int], list[int]] = links or {}

    def write(self, basename: str, lib: str, fac: FileFactory) -> None:
        name = f"{basename}-scaf.{lib}"
        payload = {
            "insert_size": self.insert_size,
            "links": [[a, b, c, g] for (a, b), (c, g) in self.links.items()],
        }
        fac.write_text(name, json.dumps(payload))

    @classmethod
    def read(cls, basename: str, lib: str, fac: FileFactory) -> "ScaffoldGraph":
        payload = json.loads(fac.read_text(f"{basename}-scaf.{lib}"))
        links = {(a, b): [c, g] for a, b, c, g in payload["links"]}
        return cls(payload["insert_size"], links)

    @staticmethod
    def exists_any(basename: str, fac: FileFactory) -> bool:
        return fac.exists(basename + "-scaf.libs")

    @staticmethod
    def libs(basename: str, fac: FileFactory) -> list[str]:
        if not fac.exists(basename + "-scaf.libs"):
            return []
        return json.loads(fac.read_text(basename + "-scaf.libs"))

    @staticmethod
    def register_lib(basename: str, lib: str, fac: FileFactory) -> None:
        libs = ScaffoldGraph.libs(basename, fac)
        if lib not in libs:
            libs.append(lib)
        fac.write_text(basename + "-scaf.libs", json.dumps(libs))

    @staticmethod
    def remove_all(basename: str, fac: FileFactory) -> None:
        for lib in ScaffoldGraph.libs(basename, fac):
            fac.remove(f"{basename}-scaf.{lib}")
        fac.remove(basename + "-scaf.libs")


def build_scaffold(
    sg: SuperGraph,
    g: Graph,
    pairs: Iterable[tuple[Read, Read]],
    *,
    orientation: str = "paired-ends",
    insert_size: int | None = None,
    expected_coverage: float | None = None,
    min_link_count: int = 10,
    log=None,
) -> ScaffoldGraph:
    from .coverage import estimate_coverage

    if expected_coverage is None:
        mult, freq = g.hist()
        expected_coverage = estimate_coverage(mult, freq)
    idx = PathIndex(g, sg)
    ucache = UniquenessCache(sg, expected_coverage)
    links, dist_hist = collect_pair_links(pairs, idx, ucache, sg, g.rho, orientation)
    if insert_size is None:
        if dist_hist:
            items = sorted(dist_hist.items())
            total = sum(c for _, c in items)
            acc = 0
            insert_size = items[-1][0]
            for d, c in items:
                acc += c
                if 2 * acc >= total:
                    insert_size = d
                    break
        else:
            insert_size = 250
        if log:
            log("info", f"estimated insert size = {insert_size}")
    out: dict[tuple[int, int], list[int]] = {}
    k = g.k
    for (a, b), (cnt, l_sum, r_sum) in links.items():
        if cnt < min_link_count:
            continue
        lhs_off = l_sum // cnt
        rhs_off = r_sum // cnt
        init_len = (sg.size(a) + k - lhs_off) + rhs_off
        gap = insert_size - init_len
        out[(a, b)] = [cnt, gap * cnt]
    return ScaffoldGraph(insert_size, out)


def scaffold(
    sg: SuperGraph,
    scafs: list[ScaffoldGraph],
    *,
    min_link_count: int = 10,
    max_gap: int = 10000,
    log=None,
) -> int:
    """Linearize scaffold links into gap-joined superpaths."""
    merged: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
    for sc in scafs:
        for l, (c, gsum) in sc.links.items():
            merged[l][0] += c
            merged[l][1] += gsum

    # unique successor/predecessor resolution, strongest links first
    by_lhs: dict[int, list] = defaultdict(list)
    for (a, b), (c, gsum) in merged.items():
        if c >= min_link_count and a != b:
            by_lhs[a].append((b, c, gsum // c))
    picks: dict[int, tuple[int, int]] = {}
    for a, bs in by_lhs.items():
        b, c, gap = max(bs, key=lambda t: t[1])
        picks[a] = (b, gap)
    # rhs uniqueness
    by_rhs: dict[int, list] = defaultdict(list)
    for a, (b, gap) in picks.items():
        by_rhs[b].append((a, merged[(a, b)][0]))
    final: dict[int, tuple[int, int]] = {}
    for b, as_ in by_rhs.items():
        a = max(as_, key=lambda t: t[1])[0]
        final[a] = picks[a]

    joins = 0
    done: set[int] = set()
    for a in sorted(final, key=lambda x: -merged[(x, final[x][0])][0]):
        b, gap = final[a]
        if a in done or b in done:
            continue
        if not (sg.live(a) and sg.live(b)):
            continue
        a_rc = sg.rc(a)
        b_rc = sg.rc(b)
        if b == a_rc or gap > max_gap:
            continue
        path = [a] + ([sg.gap_path(max(gap, 1))] if True else []) + [b]
        sg.link(path)
        done.update((a, b, a_rc, b_rc))
        sg.erase(a)
        if b != a and b != a_rc:
            sg.erase(b)
        joins += 1
    if log:
        log("info", f"scaffold: {joins} joins")
    return joins
