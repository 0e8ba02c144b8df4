"""Benchmark: build-graph k-mer counting throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors BASELINE.md's north-star config: E. coli-scale
build-graph at k=25 (26-mer edges, both strands).  Reads are synthesized
on the host directly as 2-bit code streams so the benchmark measures the
TPU counting engine (kmerize -> sort -> dedup -> merge), not Python
parsing.

vs_baseline: MEASURED (round 3).  scripts/baseline/bench_backyard.cc
compiles the reference's own BackyardHash+BlendedSort hot loop and
measures 3.00M rho-mers/s per core on this host (insert+sort, parse
excluded, same workload); the denominator is the favorable-to-reference
linear 32-thread extrapolation 96M rho-mers/s (BASELINE.md "Measured
reference baseline").  Rounds 1-2 divided by a 20M/s estimate instead.
"""

import json
import sys
import time

import numpy as np

CPU_BASELINE_KMERS_PER_SEC = 96e6  # measured: 32 x 3.00M/core (BASELINE.md)


def synth_stream(genome_mb: float, coverage: int, read_len: int, rho: int,
                 chunk: int):
    """Flat code stream of synthetic reads over a random genome.

    One vectorized gather builds the whole stream.  Returns (flat,
    n_chunks, pass_starts, data_end): reads are laid out periodically
    (read_len bases + one 255 separator) in ``coverage`` passes, each
    pass starting a fresh period at ``pass_starts[k]`` — the geometry
    the periodic packed-transfer mode consumes.  (This mimics the
    native reader, which parses FASTQ at ~1GB/s — read synthesis must
    not dominate the timed region.)
    """
    rng = np.random.default_rng(42)
    glen = int(genome_mb * 1e6)
    genome = rng.integers(0, 4, size=glen, dtype=np.uint8)
    # coverage passes of read-length tiles at shifted phases: same read
    # count, window count and k-mer spectrum shape as random-start reads,
    # but built by memcpy (random gathers are erratically slow on this
    # host and would pollute a device-throughput benchmark)
    total = coverage * (glen // read_len) * (read_len + 1)  # upper bound
    n_chunks = -(-total // chunk)
    flat = np.full(n_chunks * chunk + rho - 1, 255, np.uint8)
    pos = 0
    pass_starts = []
    for _ in range(coverage):
        off = int(rng.integers(0, read_len))
        rows = (glen - off) // read_len
        pass_starts.append(pos)
        view = flat[pos : pos + rows * (read_len + 1)]
        m = view.reshape(rows, read_len + 1)
        m[:, :read_len] = genome[off : off + rows * read_len].reshape(
            rows, read_len)
        m[:, read_len] = 255
        pos += rows * (read_len + 1)
    return flat, n_chunks, pass_starts, pos


def synth_chunks(genome_mb: float, coverage: int, read_len: int, rho: int,
                 chunk: int):
    """Yield flat code chunks (views) of :func:`synth_stream`."""
    flat, n_chunks, _, _ = synth_stream(genome_mb, coverage, read_len,
                                        rho, chunk)
    for i in range(n_chunks):
        yield flat[i * chunk : (i + 1) * chunk + rho - 1]


# MEASURED (round 4): scripts/baseline/bench_classify.cc compiles the
# reference's own KmerSet+WordyBitVector+normalize and times the exact
# `xenome classify` per-k-mer loop (GossCmdGroupReads.cc:381-468) on
# this workload: 74.8K reads/s/core, 2.01x at 2 threads; denominator is
# the favorable-to-reference linear 32-thread extrapolation (BASELINE.md
# "Measured reference classify baseline").  Rounds 1-3 divided by the
# project's own round-1 Python path (5.6K reads/s) instead.
CPU_BASELINE_CLASSIFY_READS_PER_SEC = 32 * 74.8e3


def bench_xenome(small: bool, to_stdout: bool = False):
    """Xenome classify on the device sort-join engine: reads/s.

    Two synthetic 'genomes' (graft/host), k=25 annotated union set,
    100bp reads drawn from both; the timed region is the classify
    engine over pre-encoded reads (parsing is the native reader's job,
    ~1GB/s).  Emits its JSON line on STDERR so stdout carries exactly
    one driver-parsed metric; the driver tail records both.
    """
    import jax.numpy as jnp
    import numpy as np

    from gossamer_tpu.classify.device import (classify_periodic_stream2,
                                              encode_set)
    from gossamer_tpu.io.stream import pack_chunk

    k = 25
    rng = np.random.default_rng(7)
    glen = int((0.2 if small else 1.0) * 1e6)
    n_reads = 20_000 if small else 200_000
    read_len = 100
    genomes = [rng.integers(0, 4, size=glen, dtype=np.uint8) for _ in range(2)]

    # annotated union set straight from canonical per-genome spectra
    from gossamer_tpu.ops.count import count_chunks

    sets = []
    for g in genomes:
        lo, hi, _ = count_chunks(
            iter([g]), k, both_strands=False, canonical=True,
            chunk=len(g) - k + 1)
        sets.append(lo)
    union = np.union1d(sets[0], sets[1])
    lhs = np.isin(union, sets[0])
    rhs = np.isin(union, sets[1])
    set_E = encode_set(union, lhs, rhs)
    # set prep (host value re-canonicalization + device staging) is
    # part of index LOADING, not per-read classify work — like the
    # reference mmap'ing its KmerSet before the read loop
    from gossamer_tpu.classify.device import prepare_set_value

    prepared = prepare_set_value(set_E, k)

    # reads: half graft, half host, pre-packed into window-sized
    # chunks (the native reader's block format; packing is untimed, as
    # parsing is on both sides — the timed region is H2D + device +
    # blrg pull, the machine-side classify work)
    starts = rng.integers(0, glen - read_len, size=n_reads)
    codes = [genomes[i % 2][s : s + read_len] for i, s in enumerate(starts)]

    window = 1 << 22
    per = window // (read_len + 1)
    packed = []
    for base in range(0, n_reads, per):
        grp = codes[base : base + per]
        parts = []
        for c in grp:
            parts.append(c)
            parts.append(np.array([255], np.uint8))
        flat = np.concatenate(parts)
        pad = window + k - 1 - len(flat)
        flat = np.concatenate([flat, np.full(pad, 255, np.uint8)])
        packed.append((pack_chunk(flat, k, window)[0], len(grp)))

    # warm-up: compile the batch program on one chunk
    classify_periodic_stream2(packed[:1], set_E, k, window, read_len,
                              prepared=prepared)

    t0 = time.time()
    blrg = classify_periodic_stream2(packed, set_E, k, window, read_len,
                                     prepared=prepared)
    dt = time.time() - t0
    rps = n_reads / dt
    assert len(blrg) == n_reads and blrg.max() > 0
    import jax

    print(f"# xenome: {n_reads} reads, {dt:.2f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "xenome_classify_reads_per_sec",
                "value": round(rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(
                    rps / CPU_BASELINE_CLASSIFY_READS_PER_SEC, 3),
                "platform": jax.default_backend(),
            }
        ),
        file=sys.stdout if to_stdout else sys.stderr,
    )


def main():
    # Watchdog wrapper: the tunnel to the dev TPU sometimes degrades to
    # the point where even the (normally ~1 min) warmup never returns.
    # Parent mode re-executes this script as a child with a time budget;
    # on expiry it kills that exact child PID and reruns on CPU so the
    # driver records an honest (slower) number instead of a hang.
    import os
    import subprocess

    if os.environ.get("GOSSAMER_BENCH_CHILD") != "1":
        budget = int(os.environ.get("GOSSAMER_BENCH_BUDGET", "540"))
        env = dict(os.environ, GOSSAMER_BENCH_CHILD="1")
        try:
            rc = subprocess.run([sys.executable] + sys.argv,
                                env=env, timeout=budget).returncode
            if rc == 0:
                return
            print(f"# TPU bench child failed rc={rc}; CPU fallback",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# TPU bench exceeded {budget}s (tunnel degraded); "
                  f"CPU fallback", file=sys.stderr)
        env["GOSSAMER_TPU_PLATFORM"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run([sys.executable] + sys.argv, env=env,
                       timeout=budget, check=True)
        return

    small = "--small" in sys.argv
    import gossamer_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    try:
        dev = jax.devices()[0]
    except Exception:
        jax.config.update("jax_platforms", "cpu")
        dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    if "--xenome" in sys.argv:
        bench_xenome(small, to_stdout=True)
        return

    from gossamer_tpu.io.stream import pack_chunk
    from gossamer_tpu.ops.engine import (SpectrumEngine, batch_step,
                                         batch_step_fold,
                                         batch_step_fold_packed_periodic,
                                         _delta_pack)

    rho = 26
    chunk = 1 << 18 if small else 1 << 22
    genome_mb = 0.5 if small else 4.6
    coverage = 5 if small else 30
    read_len = 100
    cap = 1 << 20 if small else 1 << 23

    # warm-up/compile the batch + expand programs outside the timed
    # region.  NOTE: must *pull* a result — on the remote (axon) runtime
    # execution is deferred until a device->host read, so
    # block_until_ready alone leaves the first real call to pay the
    # deferred-first-execution cost.
    from gossamer_tpu.ops.engine import empty_spec

    # batch width = chunks per flush/program.  34 bench chunks as
    # [F0, B, B] = [6, 14, 14] -> three launches: per-program gaps on
    # the remote runtime measured ~35-70ms so fewer/larger flushes beat
    # round 4's width 8 (5 launches), and a SMALL first flush moves the
    # early-pull snapshot forward so its device->host transfer overlaps
    # the remaining ~80% of compute (it only overlapped ~50% at width
    # 17, leaving a transfer tail at degraded links).
    import os as _os

    B = int(_os.environ.get("GOSSAMER_BENCH_BATCH", "5" if small else "14"))
    F0 = int(_os.environ.get("GOSSAMER_BENCH_FIRST_BATCH",
                             "5" if small else "6"))
    warm = np.random.default_rng(0).integers(
        0, 4, size=(max(B, F0), chunk + rho - 1), dtype=np.uint8
    )
    use_fold = jax.default_backend() == "tpu"
    # NOTE: the engine's scan_groups mode (several flushes per program
    # launch) was benched and REJECTED here: lax.scan over the Pallas
    # fold kernel never finished the remote AOT compile (>15 min; the
    # per-flush program compiles in ~1 min).  Launch overhead stays.
    if use_fold:
        # PERIODIC packed-transfer path: fixed-length read streams need
        # only the 2-bit words on the wire (0.25 B/base — the H2D
        # floor); per-window validity is one mod against the read
        # period on device.  (A sparse separator-POSITION format was
        # built and parity-tested but REJECTED: reconstructing validity
        # from positions needs a scatter (~5s/flush) or searchsorted
        # (11s/flush) on this TPU, while the periodic/bitmap formulas
        # cost ~nothing — docs/design.md.)
        T = read_len + 1
        pw = [pack_chunk(warm[i], rho, chunk)[0]
              for i in range(max(B, F0))]
        w = None
        for width in sorted({F0, B}):
            zero = np.zeros(width, np.int32)
            w = batch_step_fold_packed_periodic(
                jnp.asarray(np.stack(pw[:width])), jnp.asarray(zero),
                jnp.asarray(zero + chunk + rho), jnp.asarray(zero + chunk),
                *empty_spec(cap), rho, "value", cap, chunk, T, False)
    else:
        w = batch_step(jnp.asarray(warm), *empty_spec(cap), rho, "value", cap)
    np.asarray(w[3])
    # warm the pull programs at the canonical cap (finish pulls the
    # canonical planes and expands on the host): delta-pack + the
    # packed-slice fallback (each is one fixed-grid compile per cap)
    from gossamer_tpu.ops.engine import _slice_pieces_packed

    pieces, excbuf, n_exc = _delta_pack(w[0], w[1], w[2], cap)
    jax.device_get([pieces[0], excbuf, n_exc])
    jax.device_get(_slice_pieces_packed(w[0], w[1], w[2],
                                        max(0, 2 * rho - 32))[:1])
    # warm the reconciled-finish programs (early pull): new-key diff +
    # count-only pack
    from gossamer_tpu.ops.engine import _count_pack, _reconcile_new_keys

    nexcp, nnew_dev = _reconcile_new_keys(w[0], w[1], w[0], w[1], cap)
    cpk, cexcbuf, cnexc = _count_pack(w[0], w[1], w[2], cap)
    jax.device_get([nexcp[0], nnew_dev, cpk[0], cexcbuf, cnexc])

    # build-graph counting semantics: fwd+rc edge spectrum via
    # min-by-value canonical classes + device-side symmetric expansion
    # input synthesis is untimed: it stands in for the native FASTQ
    # reader (~1GB/s, i.e. ~0.15s for this workload) and numpy synthesis
    # is slower than that, so timing it would overstate input cost
    flat, n_chunks, pass_starts, data_end = synth_stream(
        genome_mb, coverage, read_len, rho, chunk)
    if use_fold:
        chunks = []
        for i in range(n_chunks):
            p0 = i * chunk
            words, _ = pack_chunk(flat[p0 : p0 + chunk + rho - 1], rho,
                                  chunk)
            cur = max(s_ for s_ in pass_starts if s_ <= p0)
            nxt = [s_ for s_ in pass_starts if s_ > p0]
            chunks.append((
                words,
                (p0 - cur) % T,
                (nxt[0] - p0) if nxt else chunk + rho,
                max(0, min(chunk, data_end - rho + 1 - p0)),
            ))
    else:
        chunks = [flat[i * chunk : (i + 1) * chunk + rho - 1]
                  for i in range(n_chunks)]

    # same-moment link probe: the tunnel's D2H rate swings 0.3-32MB/s
    # across a day (docs/design.md) and the workload moves ~37MB H2D +
    # ~27MB D2H per run, so the wall is wire-bound; recording the link
    # speed next to the metric makes the floor auditable per record
    probe = jnp.arange(1 << 20, dtype=jnp.int32) * 3  # 4MB
    probe.block_until_ready()
    t0 = time.time()
    np.asarray(probe)
    d2h = 4.0 / max(time.time() - t0, 1e-9)
    print(f"# link probe: D2H {d2h:.1f} MB/s; wire per run ~36MB H2D "
          f"(words only) + ~27MB D2H", file=sys.stderr)

    # Best of 3 runs: the tunnel to the dev TPU has high background
    # variance (device->host probes measured 8-37MB/s across a day, and
    # the pull is a large share of end-to-end); the minimum time
    # estimates machine capability, interference excluded.
    reps = 1 if small else 3
    best_dt, lo, counts, best_phases = None, None, None, {}
    for _ in range(reps):
        # cap is sized to the workload's distinct-class count, so run
        # the zero-sync path (spill checks would add a device sync per
        # batch; overflow is still hard-checked at finish).  Early pull:
        # snapshot the key planes after the first flush and stream them
        # device->host while the remaining batches compute; finish then
        # pulls only final counts + post-snapshot keys (engine.py
        # snapshot_async).  expected_distinct sizes the snapshot without
        # a device sync: distinct canonical classes ~= genome length.
        eng = SpectrumEngine(rho, "value", chunk, cap=cap, spill=False,
                             batch=B, first_batch=F0, early_pull_flush=1,
                             expected_distinct=int(genome_mb * 1.1e6),
                             period=read_len + 1)
        t0 = time.time()
        if use_fold:
            for words, ph, bound, nwin in chunks:
                eng.add_chunk_packed_periodic(words, ph, bound, nwin)
        else:
            for codes in chunks:
                eng.add_chunk(codes)
        t_add = time.time() - t0
        lo, hi, counts = eng.finish_expanded()
        dt = time.time() - t0
        phases = dict(eng.phases, add=round(t_add, 3))
        print(f"# run: {dt:.2f}s  phases {phases}", file=sys.stderr)
        if best_dt is None or dt < best_dt:
            best_dt = dt
            best_phases = phases
    dt = best_dt

    total_inserted = int(np.asarray(counts).sum())  # fwd+rc instances
    kps = total_inserted / dt
    print(
        f"# {total_inserted} rho-mers, {len(lo)} distinct, {dt:.2f}s",
        file=sys.stderr,
    )
    if "--no-xenome" not in sys.argv:
        try:
            bench_xenome(small)
        except Exception as e:  # secondary metric must never sink the run
            print(f"# xenome bench failed: {e!r}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "build_graph_kmers_per_sec",
                "value": round(kps, 1),
                "unit": "rho-mers/s",
                "vs_baseline": round(kps / CPU_BASELINE_KMERS_PER_SEC, 3),
                # provenance: a CPU-fallback rerun (watchdog) must never
                # be mistaken for a TPU number (VERDICT r3 weak #6);
                # link_d2h_mb_s is the same-moment tunnel probe — the
                # workload moves ~64MB/run, so wall tracks this number
                "platform": jax.default_backend(),
                "best_of": reps,
                "link_d2h_mb_s": round(d2h, 1),
                # per-phase seconds of the best run (VERDICT r4 item 7:
                # a link-speed dip must be distinguishable from a code
                # regression at a glance).  add = host dispatch loop
                # (H2D + program dispatch); sync = wait for queued
                # device compute; reconcile/pull = finish-time transfer
                # + decode; expand lives inside reconcile (pre-expanded
                # mid-stream by the snapshot worker).
                "phases": best_phases,
            }
        )
    )


if __name__ == "__main__":
    main()
