"""Device sort-join classification vs the host engine."""

import random

import numpy as np
import jax.numpy as jnp

from gossamer_tpu.classify.annotated_set import compute_near_kmers, merge_and_annotate
from gossamer_tpu.classify.device import classify_codes_device, encode_set
from gossamer_tpu.classify.xenome import _batch_blrg
from gossamer_tpu.core import kmer as K
from gossamer_tpu.graph.build import build_kmer_set
from gossamer_tpu.io.readers import Read


def test_device_classify_matches_host():
    rng = random.Random(91)
    g = "".join(rng.choice("ACGT") for _ in range(500))
    h = "".join(rng.choice("ACGT") for _ in range(500))
    a, _ = build_kmer_set([Read("g", g.encode())], 15, chunk=4096)
    b, _ = build_kmer_set([Read("h", h.encode())], 15, chunk=4096)
    ann, _ = merge_and_annotate(a, b)
    compute_near_kmers(ann)

    reads = []
    for src in (g, h):
        for _ in range(10):
            p = rng.randrange(0, len(src) - 60)
            reads.append(src[p : p + 60])
    for _ in range(5):
        reads.append("".join(rng.choice("ACGTN") for _ in range(60)))
    reads.append("A" * 40)  # all-A probe (key-0 forward-fill edge case)

    codes = [K.encode_bases(s.encode()) for s in reads]
    want = _batch_blrg(codes, ann)
    set_E = jnp.asarray(encode_set(ann.kset.lo, ann.lhs, ann.rhs))
    got = classify_codes_device(codes, set_E, 15, window=1 << 12)
    np.testing.assert_array_equal(got, want)
