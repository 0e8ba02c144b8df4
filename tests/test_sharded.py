"""Sharded multi-device counting vs the single-device pipeline."""

import random

import numpy as np
import pytest

import jax

from gossamer_tpu.io.readers import Read
from gossamer_tpu.io.stream import flat_code_chunks
from gossamer_tpu.ops.count import count_rho_mers
from gossamer_tpu.parallel.count_sharded import sharded_spectrum
from gossamer_tpu.parallel.mesh import data_mesh


def make_reads(rng, n, length):
    return [
        Read(str(i), "".join(rng.choice("ACGTN") if rng.random() < 0.02
                             else rng.choice("ACGT") for _ in range(length)).encode())
        for i in range(n)
    ]


def batch_chunks(reads, rho, chunk, n_dev):
    """Group flat chunks into (n_dev, chunk+rho-1) batches (pad w/ 255)."""
    chunks = list(flat_code_chunks(reads, rho, chunk=chunk))
    pad = np.full(chunk + rho - 1, 255, dtype=np.uint8)
    while len(chunks) % n_dev:
        chunks.append(pad)
    for i in range(0, len(chunks), n_dev):
        yield np.stack(chunks[i : i + n_dev])


@pytest.mark.parametrize("rho,canonical,both", [(25, False, True), (21, True, False)])
def test_sharded_matches_host(rho, canonical, both):
    assert len(jax.devices()) == 8
    rng = random.Random(rho)
    reads = make_reads(rng, 60, 70)
    mesh = data_mesh()
    chunk = 256
    lo, hi, c, hist = sharded_spectrum(
        batch_chunks(reads, rho, chunk, 8), mesh, rho, chunk,
        both_strands=both, canonical=canonical,
    )
    wlo, whi, wc = count_rho_mers(
        reads, rho, both_strands=both, canonical=canonical, chunk=chunk
    )
    np.testing.assert_array_equal(lo, wlo)
    np.testing.assert_array_equal(hi, whi)
    np.testing.assert_array_equal(c, wc)
    # histogram consistency
    want_hist = np.zeros(64, dtype=np.int64)
    np.add.at(want_hist, np.clip(wc, 0, 63), 1)
    np.testing.assert_array_equal(hist, want_hist)
