"""Debug the early-pull reconcile on the real device (small workload)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import gossamer_tpu  # noqa: F401
import jax

import bench as B
from gossamer_tpu.io.stream import pack_chunk
from gossamer_tpu.ops.engine import SpectrumEngine


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rho = 26
    chunk = 1 << 22
    genome_mb, coverage, read_len = 4.6, 10, 100
    cap = 1 << 23

    use_fold = jax.default_backend() == "tpu"
    chunks = list(B.synth_chunks(genome_mb, coverage, read_len, rho, chunk))
    if use_fold:
        chunks = [pack_chunk(c, rho, chunk) for c in chunks]
    eng = SpectrumEngine(rho, "value", chunk, cap=cap, spill=False,
                         early_pull_flush=1,
                         expected_distinct=int(genome_mb * 1.1e6))
    for c in chunks:
        if use_fold:
            eng.add_chunk_packed(*c)
        else:
            eng.add_chunk(c)
    eng._finish_flush()
    print(f"# snap set: {eng._snap is not None}", flush=True)
    n_out = int(eng.live_scalars[-1])
    planes = eng.spec
    spec_s, k, pe, sel, s_excp, live_s = eng._snap
    n1 = int(live_s)
    print(f"# n1={n1} n_out={n_out} k={k} pe={pe}", flush=True)
    t0 = time.time()
    out = eng._pull_reconciled(planes, n_out)
    print(f"# reconciled pull {time.time() - t0:.2f}s", flush=True)
    print(f"# reconciled: {out is not None}", flush=True)
    if out is not None:
        lo, hi, c = out
        eng._snap = None
        lo2, hi2, c2 = eng._pull_planes(planes, n_out)
        print(f"# parity keys={np.array_equal(lo, lo2)} "
              f"counts={np.array_equal(c, c2)}", flush=True)


if __name__ == "__main__":
    main()
