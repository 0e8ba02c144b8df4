"""Multi-pass classification equals single-pass."""

import random

import numpy as np

from gossamer_tpu.classify.annotated_set import compute_near_kmers, merge_and_annotate
from gossamer_tpu.classify.xenome import classify_reads
from gossamer_tpu.graph.build import build_kmer_set
from gossamer_tpu.io.readers import Read


def test_multipass_matches_single_pass():
    rng = random.Random(88)
    g = "".join(rng.choice("ACGT") for _ in range(400))
    h = "".join(rng.choice("ACGT") for _ in range(400))
    reads = []
    for src in (g, h):
        for _ in range(8):
            p = rng.randrange(0, len(src) - 50)
            reads.append(Read(str(len(reads)), src[p : p + 50].encode()))
    a, _ = build_kmer_set([Read("g", g.encode())], 15, chunk=4096)
    b, _ = build_kmer_set([Read("h", h.encode())], 15, chunk=4096)
    ann, _ = merge_and_annotate(a, b)
    compute_near_kmers(ann)
    one = [(r.label, blrg) for r, blrg in classify_reads(reads, ann, passes=1)]
    for p in (2, 3, 7):
        multi = [(r.label, blrg) for r, blrg in classify_reads(reads, ann, passes=p)]
        assert multi == one, f"passes={p}"
