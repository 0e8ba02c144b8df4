"""Mesh-sharded cleanup passes vs the single-host graph (8-dev CPU mesh).

SURVEY.md §2.10 traversal story: degree lookups as all_gather +
sort-join + psum of per-shard lower bounds.  Parity oracle: the host
Graph's vectorized degree/trim computations.
"""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from gossamer_tpu.graph.build import build_graph
from gossamer_tpu.io.readers import Read
from gossamer_tpu.parallel.cleanup_sharded import (sharded_degrees,
                                                   sharded_tip_candidates,
                                                   sharded_trim_mask)


def _mk_graph(seed=5, k=11, n_reads=80, read_len=60, glen=500):
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    genome = "".join(rng.choice(list(bases), glen))
    reads = []
    for i in range(n_reads):
        p = int(rng.integers(0, glen - read_len))
        reads.append(Read(f"r{i}".encode(), genome[p : p + read_len].encode(),
                          None))
    return build_graph(iter(reads), k, chunk=8192)


@pytest.mark.parametrize("n_dev", [3, 8])
def test_sharded_degrees_parity(n_dev):
    g = _mk_graph()
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    out_d, in_d = sharded_degrees(mesh, g.lo, g.rho)
    flo, fhi = g.from_node(g.lo, g.hi)
    exp_out = np.asarray(g.out_degree(flo, fhi))
    exp_in = np.asarray(g.in_degree(flo, fhi))
    assert np.array_equal(out_d, exp_out)
    assert np.array_equal(in_d, exp_in)


def test_sharded_tip_candidates_parity():
    g = _mk_graph(seed=9)
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    cand = sharded_tip_candidates(mesh, g.lo, g.rho)
    flo, fhi = g.from_node(g.lo, g.hi)
    exp = np.asarray(g.in_degree(flo, fhi)) == 0
    assert np.array_equal(cand, exp)


def test_sharded_trim_mask_parity():
    g = _mk_graph(seed=11)
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    keep, kept = sharded_trim_mask(mesh, g.counts, 2)
    exp = np.asarray(g.counts) >= 2
    assert np.array_equal(keep, exp)
    assert kept == int(exp.sum())


def test_cli_sharded_cleanup_byte_parity(tmp_path):
    """goss trim-graph/prune-tips --num-devices == single-host output."""
    import subprocess
    import sys

    rng = np.random.default_rng(3)
    genome = "".join(np.random.default_rng(3).choice(list("ACGT"), 400))
    with open(tmp_path / "reads.fasta", "w") as f:
        for i in range(120):
            p = int(rng.integers(0, 340))
            f.write(f">r{i}\n{genome[p : p + 60]}\n")

    import os

    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))),
               JAX_PLATFORMS="cpu")

    def run(*args):
        subprocess.run([sys.executable, "-m", "gossamer_tpu.cli.goss",
                        *args], cwd=tmp_path, check=True, env=env,
                       capture_output=True)

    run("build-graph", "-k", "11", "-I", "reads.fasta", "-O", "g")
    run("trim-graph", "-G", "g", "-O", "t1", "-C", "2")
    run("trim-graph", "-G", "g", "-O", "t8", "-C", "2",
        "--num-devices", "8")
    run("prune-tips", "-G", "t1", "-O", "p1", "--iterate", "2")
    run("prune-tips", "-G", "t1", "-O", "p8", "--iterate", "2",
        "--num-devices", "8")

    def dump(name):
        r = subprocess.run([sys.executable, "-m", "gossamer_tpu.cli.goss",
                            "dump-graph", "-G", name], cwd=tmp_path,
                           check=True, env=env, capture_output=True)
        return r.stdout

    assert dump("t1") == dump("t8")
    assert dump("p1") == dump("p8")
