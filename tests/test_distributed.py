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
