"""MultithreadedBatchTask + GossKillSignal analogs (utils/batch_task.py).

Reference: ``src/MultithreadedBatchTask.hh:51`` (T worker threads over
blocks with progress + cooperative abort), ``src/GossKillSignal.hh``
(kill-file polling).
"""

import os
import time

import numpy as np
import pytest

from gossamer_tpu.utils.batch_task import (AbortRequested, BatchTask,
                                           KillSignal)


@pytest.mark.parametrize("threads", [1, 3])
def test_batch_task_merges_all_blocks(threads):
    blocks = [np.arange(i, i + 10) for i in range(0, 200, 10)]
    seen = []
    progress = []
    BatchTask(threads, on_progress=progress.append).run(
        iter(blocks), lambda b: int(b.sum()), seen.append)
    assert sorted(seen) == sorted(int(b.sum()) for b in blocks)
    assert progress[-1] == len(blocks)


@pytest.mark.parametrize("threads", [1, 3])
def test_batch_task_propagates_worker_error(threads):
    def worker(b):
        if b == 7:
            raise ValueError("boom")
        return b

    with pytest.raises(ValueError, match="boom"):
        BatchTask(threads).run(range(32), worker, lambda r: None)


def test_batch_task_streaming_source_not_materialized():
    """Blocks are pulled lazily (bounded in-flight queue)."""
    high_water = [0]
    outstanding = [0]

    def source():
        for i in range(64):
            outstanding[0] += 1
            high_water[0] = max(high_water[0], outstanding[0])
            yield i

    def worker(b):
        time.sleep(0.001)
        outstanding[0] -= 1
        return b

    BatchTask(2).run(source(), worker, lambda r: None)
    assert high_water[0] <= 2 * 2 + 2


def test_kill_signal_cooperative_abort(tmp_path):
    kf = str(tmp_path / "kill")
    ks = KillSignal(kf, check_every_s=0.01, hard_exit=False).start()
    try:
        def worker(b):
            if b == 3:
                open(kf, "w").write("x")
            time.sleep(0.03)
            return b

        with pytest.raises(AbortRequested):
            BatchTask(2, kill=ks).run(range(1000), worker, lambda r: None)
    finally:
        ks.stop()
        os.unlink(kf)


def test_kill_signal_requested_flag(tmp_path):
    kf = str(tmp_path / "kill2")
    ks = KillSignal(kf, check_every_s=0.01, hard_exit=False).start()
    assert not ks.requested()
    open(kf, "w").write("x")
    time.sleep(0.1)
    assert ks.requested()
    ks.stop()
