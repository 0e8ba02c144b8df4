"""Per-phase profile of the build-graph counting pipeline on real TPU.

Publishes the breakdown VERDICT r2 asked for: where do the ~14x between
the fold kernel (574M lanes/s) and end-to-end (40M rho-mers/s) go?

Phases measured (each isolated with explicit blocking):
  h2d        - host->device transfer of all packed chunks (device_put)
  steps      - batch_step_fold_packed over RESIDENT data (compute only)
  expand     - device-side symmetric expansion
  pull       - device->host transfer of the packed result planes
  e2e        - the bench.py loop as-shipped (pipelined h2d + steps + pull)

Run on the real chip:  python scripts/profile_count.py [--small]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    small = "--small" in sys.argv
    import gossamer_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev}")

    from bench import synth_chunks, CPU_BASELINE_KMERS_PER_SEC  # noqa
    from gossamer_tpu.io.stream import pack_chunk
    from gossamer_tpu.ops.engine import (
        SpectrumEngine, batch_step_fold_packed, empty_spec, expand_step,
        _slice_pieces_packed)

    rho = 26
    chunk = 1 << 18 if small else 1 << 22
    genome_mb = 0.5 if small else 4.6
    coverage = 5 if small else 30
    cap = 1 << 20 if small else 1 << 23
    B = 8

    chunks = list(synth_chunks(genome_mb, coverage, 100, rho, chunk))
    packed = [pack_chunk(c, rho, chunk) for c in chunks]
    n = len(packed)
    nb = n // B
    total_bytes = sum(a.nbytes + b.nbytes for a, b in packed)
    print(f"# {n} chunks ({nb} full batches of {B}), "
          f"{total_bytes/1e6:.1f} MB packed input")

    # --- compile everything first
    stacks = []
    for i in range(nb):
        grp = packed[i * B : (i + 1) * B]
        stacks.append((np.stack([a for a, _ in grp]),
                       np.stack([b for _, b in grp])))
    spec = empty_spec(cap)
    w = batch_step_fold_packed(jnp.asarray(stacks[0][0]),
                               jnp.asarray(stacks[0][1]),
                               *spec, rho, "value", cap, chunk, False)
    we = expand_step(*w[:3], rho)
    np.asarray(we[3])
    jax.device_get(_slice_pieces_packed(we[0], we[1], we[2],
                                        max(0, 2 * rho - 32))[:1])

    # --- phase: h2d (transfer alone, all batches, blocked)
    t0 = time.time()
    dev_stacks = [(jax.device_put(a), jax.device_put(b)) for a, b in stacks]
    for a, b in dev_stacks:
        b.block_until_ready()
        a.block_until_ready()
    t_h2d = time.time() - t0
    print(f"h2d    {t_h2d:8.3f}s  ({total_bytes/t_h2d/1e6:.0f} MB/s)")

    # --- phase: steps over resident data
    s = empty_spec(cap)
    t0 = time.time()
    for a, b in dev_stacks:
        out = batch_step_fold_packed(a, b, *s[:3], rho, "value", cap,
                                     chunk, False)
        s = out
    live = int(out[3])  # forces the chain
    t_steps = time.time() - t0
    lanes = nb * B * chunk
    print(f"steps  {t_steps:8.3f}s  ({lanes/t_steps/1e6:.0f}M lanes/s, "
          f"live={live})")

    # --- phase: expand
    t0 = time.time()
    ex = expand_step(*out[:3], rho)
    n_out = int(ex[3])
    t_exp = time.time() - t0
    print(f"expand {t_exp:8.3f}s  (n_out={n_out})")

    # --- phase: pull
    eng = SpectrumEngine(rho, "value", chunk, cap=cap, spill=False)
    eng.cap = cap
    eng.spec = out[:3]
    eng.live_scalars = [out[3]]
    t0 = time.time()
    lo, hi, c = eng._pull_planes(ex[:3], n_out)
    t_pull = time.time() - t0
    pulled = n_out * 8
    print(f"pull   {t_pull:8.3f}s  ({pulled/1e6:.1f} MB @ "
          f"{pulled/t_pull/1e6:.0f} MB/s)")

    # --- phase: e2e exactly as bench.py ships it
    t0 = time.time()
    eng = SpectrumEngine(rho, "value", chunk, cap=cap, spill=False)
    for words, inval in packed:
        eng.add_chunk_packed(words, inval)
    lo, hi, c = eng.finish_expanded()
    t_e2e = time.time() - t0
    total = int(np.asarray(c).sum())
    print(f"e2e    {t_e2e:8.3f}s  ({total/t_e2e/1e6:.1f}M rho-mers/s)")
    print(f"# sum of isolated phases: "
          f"{t_h2d + t_steps + t_exp + t_pull:.3f}s")


if __name__ == "__main__":
    main()
