"""SuperGraph: mutable assembly graph over linear segments.

TPU-native counterpart of ``src/SuperGraph.{hh,cc}`` (``SuperGraph.hh:40-508``):
a small host-side structure (per-segment, not per-edge) holding superpaths
over an EntryEdgeSet, with rc pairing, link/erase editing, gap paths and
contig printing.  Device work (pair/read anchoring) happens before paths
reach this structure; path surgery itself is tiny and stays on host,
mirroring the reference's design where the SuperGraph is orders of
magnitude smaller than the Graph.

Full implementation lands with the assembly stage; this module currently
provides artifact presence probing used by print-contigs (§3.2).
"""

from __future__ import annotations

from ..io.factory import FileFactory

SUPERGRAPH_VERSION = 2012032901  # reference src/SuperGraph.cc version header


def supergraph_exists(basename: str, fac: FileFactory) -> bool:
    """Mirror of ``SuperGraph::existSuperGraphFiles``."""
    return fac.exists(basename + "-supergraph.header")


class SuperGraph:
    @classmethod
    def read(cls, basename: str, fac: FileFactory) -> "SuperGraph":
        raise NotImplementedError("supergraph stage not yet built")
