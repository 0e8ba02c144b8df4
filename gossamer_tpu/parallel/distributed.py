"""Multi-host execution helpers.

The reference's multi-machine story is "build shards on separate
machines, then merge-graphs" (``docs/goss.md:52-55,388``).  Here the
native path is jax.distributed: every host runs the same program, reads
its slice of the input files, and the sharded counting step
(:mod:`gossamer_tpu.parallel.count_sharded`) exchanges k-mers over
ICI/DCN with the same all-to-all, with the k-mer range partition spanning
the global mesh.

Usage (one process per host):

    from gossamer_tpu.parallel import distributed
    distributed.initialize(coordinator="host0:9981", num_processes=N,
                           process_id=i)
    mesh = distributed.global_mesh()
    ... sharded_spectrum(batches_for_this_host, mesh, ...)

Every host must feed the same number of chunk batches (pad with empty
chunks); results are globally sorted and each host holds its key-range
shard, so `merge-graphs` semantics fall out of a gather.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks."""
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh():
    """1-D mesh over every device across all hosts."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("d",))


def partition_files(paths: list[str], process_id: int, num_processes: int) -> list[str]:
    """Static round-robin file assignment per host."""
    return [p for i, p in enumerate(paths) if i % num_processes == process_id]


def configure(opts, files: list, log=None):
    """CLI hook (build-graph/build-kmer-set ``--coordinator`` etc.):
    initialize jax.distributed, take this host's file share, and return
    (files_for_this_host, global_device_count).

    Every host must stream comparable chunk counts — the sharded engine
    pads each flush group, so stragglers only cost padding.
    """
    coord = getattr(opts, "coordinator", None)
    if not coord:
        return files, None
    num = int(getattr(opts, "num_processes", 0) or 0)
    pid = int(getattr(opts, "process_id", 0) or 0)
    initialize(coordinator=coord, num_processes=num or None, process_id=pid)
    import jax

    mine = partition_files([n for n, _ in files], pid, max(1, num))
    mine_set = set(mine)
    if log is not None:
        log("info", f"distributed: host {pid}/{num} takes "
                    f"{len(mine)}/{len(files)} input files, global mesh "
                    f"has {len(jax.devices())} devices")
    return [f for f in files if f[0] in mine_set], len(jax.devices())
