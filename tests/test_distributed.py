"""Multi-host helpers: file partitioning and the CLI configure hook."""

import numpy as np
import pytest

from gossamer_tpu.parallel import distributed


def test_partition_files_round_robin():
    paths = [f"f{i}" for i in range(10)]
    shares = [distributed.partition_files(paths, p, 3) for p in range(3)]
    assert sorted(sum(shares, [])) == sorted(paths)
    assert all(len(s) in (3, 4) for s in shares)
    # disjoint
    assert len(set(sum(shares, []))) == 10


def test_configure_noop_without_coordinator():
    class O:
        coordinator = None

    files = [("a.fa", "fasta"), ("b.fa", "fasta")]
    got, n = distributed.configure(O(), files)
    assert got == files and n is None


def test_configure_initializes_and_partitions(monkeypatch):
    calls = {}

    def fake_init(coordinator=None, num_processes=None, process_id=None):
        calls["args"] = (coordinator, num_processes, process_id)

    monkeypatch.setattr(distributed, "initialize",
                        lambda **kw: fake_init(**kw))

    class O:
        coordinator = "host0:9981"
        num_processes = 2
        process_id = 1

    files = [(f"f{i}.fa", "fasta") for i in range(5)]
    logs = []
    got, n = distributed.configure(O(), files,
                                   log=lambda lvl, m: logs.append(m))
    assert calls["args"] == ("host0:9981", 2, 1)
    assert [f for f, _ in got] == ["f1.fa", "f3.fa"]
    assert n == len(__import__("jax").devices())
    assert logs and "distributed" in logs[0]


def test_two_process_sharded_counting(tmp_path):
    """REAL jax.distributed run: 2 processes x 2 CPU devices count
    disjoint chunk shares over the global 4-device mesh; the gathered
    spectrum must equal the single-device engine's."""
    import os
    import socket
    import subprocess
    import sys

    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    worker = os.path.join(os.path.dirname(__file__), "dist_count_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu at config level
    procs = [subprocess.Popen(
        [sys.executable, worker, str(p), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, (o.decode()[-500:], e.decode()[-2000:])

    a = np.load(tmp_path / "out_0.npz")
    b = np.load(tmp_path / "out_1.npz")
    assert np.array_equal(a["lo"], b["lo"])
    assert np.array_equal(a["cnt"], b["cnt"])

    # single-device oracle over ALL chunks
    from gossamer_tpu.io.stream import pack_chunk
    from gossamer_tpu.ops.engine import SpectrumEngine

    rho, chunk = 13, 256
    rng = np.random.default_rng(77)
    chunks = [rng.integers(0, 4, chunk + rho - 1, dtype=np.uint8)
              for _ in range(8)]
    eng = SpectrumEngine(rho, "value", chunk, batch=2, cap=1 << 14,
                         spill=False)
    for c in chunks:
        eng.add_chunk_packed(*pack_chunk(c, rho, chunk))
    lo, _hi, cnt = eng.finish_expanded()
    assert np.array_equal(a["lo"], lo)
    assert np.array_equal(a["cnt"], cnt)

    # cross-process graph walk: degrees computed over the 2-process
    # 4-device mesh must equal the single-host Graph's
    from gossamer_tpu.graph.graph import Graph

    g = Graph(rho - 1, lo, np.zeros_like(lo), cnt)
    flo, fhi = g.from_node(g.lo, g.hi)
    exp_out = np.asarray(g.out_degree(flo, fhi))
    exp_in = np.asarray(g.in_degree(flo, fhi))
    for r in (a, b):
        assert np.array_equal(r["out_d"], exp_out)
        assert np.array_equal(r["in_d"], exp_in)

    # cross-process prune-tips WALK parity vs the host TrimView pass
    from gossamer_tpu.algo.cleanup import prune_tips

    exp_g = prune_tips(g, iterations=2)
    for r in (a, b):
        got_g = g.remove_edges(r["dead"])
        assert np.array_equal(np.asarray(got_g.lo), np.asarray(exp_g.lo))

    # cross-process classify blrg parity vs the single-device engine
    from gossamer_tpu.classify.device import (classify_codes_device,
                                              encode_set)
    from gossamer_tpu.core import kmer as K

    k = rho - 1
    nodes = np.unique(lo >> np.uint64(2))
    nlo, _nhi, _ = K.normalize(nodes, np.zeros_like(nodes), k)
    uniq = np.unique(nlo)
    set_E = np.sort(encode_set(
        uniq, np.arange(len(uniq)) % 2 == 0, np.arange(len(uniq)) % 3 == 0))
    rng2 = np.random.default_rng(5)
    reads = [rng2.integers(0, 4, 40, np.uint8) for _ in range(23)]
    import jax.numpy as jnp

    exp_blrg = classify_codes_device(reads, jnp.asarray(set_E), k,
                                     window=1 << 12)
    for r in (a, b):
        assert np.array_equal(r["blrg"], np.asarray(exp_blrg))
