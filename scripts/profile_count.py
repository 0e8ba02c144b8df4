"""Per-phase breakdown of the build-graph counting pipeline on TPU.

The axon runtime defers execution until a device->host pull, so the
phases separate cleanly by inserting forcing reads at the boundaries:

  dispatch  — host pack/stack + H2D transfers + program dispatch
  device    — all queued batch_step_fold compute (forced via the last
              live scalar)
  pull      — delta-compressed device->host transfer of the CANONICAL
              spectrum (pack compute + transfer + native unpack)
  expand    — canonical -> symmetric fwd+rc spectrum on the host
              (native rc + radix sort + merge)

Usage: python scripts/profile_count.py [--small] [--runs N]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import bench as B


def main():
    small = "--small" in sys.argv
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    import gossamer_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    from gossamer_tpu.io.stream import pack_chunk
    from gossamer_tpu.ops.engine import (SpectrumEngine, batch_step,
                                         batch_step_fold_packed, empty_spec,
                                         _delta_pack, _slice_pieces_packed)

    rho = 26
    chunk = 1 << 18 if small else 1 << 22
    genome_mb = 0.5 if small else 4.6
    coverage = 5 if small else 30
    read_len = 100
    cap = 1 << 20 if small else 1 << 23

    use_fold = jax.default_backend() == "tpu"
    warm = np.random.default_rng(0).integers(
        0, 4, size=(8, chunk + rho - 1), dtype=np.uint8)
    if use_fold:
        pw = [pack_chunk(warm[i], rho, chunk) for i in range(8)]
        w = batch_step_fold_packed(
            jnp.asarray(np.stack([a for a, _ in pw])),
            jnp.asarray(np.stack([b for _, b in pw])),
            *empty_spec(cap), rho, "value", cap, chunk, False)
    else:
        w = batch_step(jnp.asarray(warm), *empty_spec(cap), rho, "value", cap)
    np.asarray(w[3])
    pieces, excbuf, n_exc = _delta_pack(w[0], w[1], w[2], cap)
    jax.device_get([pieces[0], excbuf, n_exc])
    jax.device_get(_slice_pieces_packed(w[0], w[1], w[2],
                                        max(0, 2 * rho - 32))[:1])

    t0 = time.time()
    chunks = list(B.synth_chunks(genome_mb, coverage, read_len, rho, chunk))
    t_synth = time.time() - t0
    t0 = time.time()
    if use_fold:
        chunks = [pack_chunk(c, rho, chunk) for c in chunks]
    t_pack = time.time() - t0
    print(f"# synth {t_synth:.2f}s  host-pack {t_pack:.2f}s (untimed in bench)",
          file=sys.stderr)

    early = "--early" in sys.argv
    if early:
        from gossamer_tpu.ops.engine import _count_pack, _reconcile_new_keys

        nexcp, nnew_dev = _reconcile_new_keys(w[0], w[1], w[0], w[1], cap)
        cpk, cexcbuf, cnexc = _count_pack(w[0], w[1], w[2], cap)
        jax.device_get([nexcp[0], nnew_dev, cpk[0], cexcbuf, cnexc])

    for r in range(runs):
        eng = SpectrumEngine(
            rho, "value", chunk, cap=cap, spill=False,
            early_pull_flush=1 if early else None,
            expected_distinct=int(genome_mb * 1.1e6) if early else None)
        t0 = time.time()
        if use_fold:
            for words, inval in chunks:
                eng.add_chunk_packed(words, inval)
        else:
            for codes in chunks:
                eng.add_chunk(codes)
        eng._flush()
        t_dispatch = time.time() - t0

        t0 = time.time()
        live = int(np.asarray(eng.live_scalars[-1]))
        t_device = time.time() - t0

        t0 = time.time()
        if early and eng._snap is not None:
            clo, _chi, cc = eng._pull_reconciled(eng.spec, live)
            eng._snap = None
        else:
            clo, _chi, cc = eng._pull_planes(eng.spec, live)
        t_pull = time.time() - t0

        from gossamer_tpu.ops.count import _expand_symmetric

        t0 = time.time()
        lo, hi, c = _expand_symmetric(clo, cc, rho)
        t_expand = time.time() - t0

        total = t_dispatch + t_device + t_expand + t_pull
        ins = int(np.asarray(c).sum())
        print(f"# run {r}: dispatch {t_dispatch:.2f}  device {t_device:.2f}  "
              f"pull {t_pull:.2f}  host-expand {t_expand:.2f}  "
              f"| total {total:.2f}s"
              f"  live {live}  out {len(lo)}  -> {ins/total/1e6:.1f}M rho-mers/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
