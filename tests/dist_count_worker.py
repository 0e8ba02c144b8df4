"""Worker for the REAL multi-process sharded-counting test.

Launched (2 processes) by tests/test_distributed.py: each process joins
a jax.distributed CPU cluster (2 local devices each -> a global 4-device
mesh), streams ITS OWN half of the read chunks into the
ShardedSpectrumEngine, and writes the globally-gathered spectrum to a
file for the parent to compare against the single-device engine.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    # force exactly 2 local devices, replacing any inherited count
    # (the test conftest exports 8 for the virtual-mesh suite)
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import gossamer_tpu  # noqa: F401  (x64 etc.)
    from gossamer_tpu.parallel import distributed

    distributed.initialize(coordinator=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    mesh = distributed.global_mesh()
    assert mesh.devices.size == 2 * nproc

    import numpy as np

    from gossamer_tpu.io.stream import pack_chunk
    from gossamer_tpu.parallel.count_sharded import ShardedSpectrumEngine

    rho, chunk = 13, 256
    rng = np.random.default_rng(77)
    # ALL processes synthesize the same 8 chunks deterministically;
    # each streams its round-robin share (the distributed.py contract)
    chunks = [rng.integers(0, 4, chunk + rho - 1, dtype=np.uint8)
              for _ in range(8)]
    mine = [c for i, c in enumerate(chunks) if i % nproc == pid]

    eng = ShardedSpectrumEngine(mesh, rho, "value", chunk, cap=1 << 14)
    for c in mine:
        eng.add_chunk_packed(*pack_chunk(c, rho, chunk))
    lo, _hi, cnt = eng.finish_expanded()

    # multi-host GRAPH WALK primitive: degree lookups over the edge set
    # sharded across BOTH processes (all_gather + sort-join + psum), the
    # cleanup passes' core (SURVEY §2.10)
    from gossamer_tpu.parallel.cleanup_sharded import sharded_degrees

    out_d, in_d = sharded_degrees(mesh, lo, rho, replicated=True)

    # cross-process CLEANUP WALK: full prune-tips pass (pointer doubling
    # + tip decisions) over the 2-process mesh (round-5 walk_sharded)
    from gossamer_tpu.parallel.walk_sharded import sharded_prune_tips_masks

    dead = sharded_prune_tips_masks(mesh, lo, cnt, rho, iterations=2)

    # cross-process CLASSIFY: annotated set sharded across both
    # processes' devices; blrg must be identical on every process
    from gossamer_tpu.classify.device import encode_set
    from gossamer_tpu.parallel.classify_sharded import ShardedClassifier

    k = rho - 1
    nodes = np.unique(lo >> np.uint64(2))
    from gossamer_tpu.core import kmer as K

    nlo, _nhi, _ = K.normalize(nodes, np.zeros_like(nodes), k)
    uniq = np.unique(nlo)
    set_E = np.sort(encode_set(
        uniq, np.arange(len(uniq)) % 2 == 0, np.arange(len(uniq)) % 3 == 0))
    rng2 = np.random.default_rng(5)
    reads = [rng2.integers(0, 4, 40, np.uint8) for _ in range(23)]
    blrg = ShardedClassifier(mesh, set_E, k, window=1 << 12).classify_codes(
        reads)

    np.savez(os.path.join(outdir, f"out_{pid}.npz"), lo=lo, cnt=cnt,
             out_d=out_d, in_d=in_d, dead=dead, blrg=blrg)
    print(f"proc {pid}: {len(lo)} keys", flush=True)


if __name__ == "__main__":
    main()
