"""Native gossio chunker vs the Python flat_code_chunks reference."""

import gzip
import random

import numpy as np
import pytest

from gossamer_tpu.io.native import load_library, native_flat_chunks
from gossamer_tpu.io.readers import Read, read_file
from gossamer_tpu.io.stream import flat_code_chunks

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native library unavailable"
)


def rand_seq(rng, n, with_n=False):
    bases = "ACGTN" if with_n else "ACGT"
    return "".join(rng.choice(bases) for _ in range(n))


def chunks_equal_modulo_invalid(native_chunks, py_chunks, k):
    """Compare valid-window content: every valid k-window and its position
    must agree; 255-codes may differ in identity (N vs separator)."""
    for nc, pc in zip(native_chunks, py_chunks):
        assert len(nc) == len(pc)
        nv = nc.copy()
        pv = pc.copy()
        nv[nv > 3] = 255
        pv[pv > 3] = 255
        np.testing.assert_array_equal(nv, pv)
    assert len(native_chunks) == len(py_chunks)


@pytest.mark.parametrize("fmt,gz", [("fasta", False), ("fastq", False),
                                    ("fasta", True), ("line", False)])
def test_native_matches_python(tmp_path, fmt, gz):
    rng = random.Random(hash(fmt) & 0xFFFF)
    reads = [rand_seq(rng, rng.randrange(30, 120), with_n=True)
             for _ in range(50)]
    name = tmp_path / f"reads.{fmt}{'.gz' if gz else ''}"
    if fmt == "fasta":
        body = "".join(f">r{i} desc\n{s[:40]}\n{s[40:]}\n" for i, s in enumerate(reads))
    elif fmt == "fastq":
        body = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(reads))
    else:
        body = "".join(s + "\n" for s in reads)
    data = body.encode()
    if gz:
        with gzip.open(name, "wb") as f:
            f.write(data)
    else:
        name.write_bytes(data)

    k = 13
    chunk = 256
    py = list(flat_code_chunks(
        read_file(str(name), fmt=fmt), k, chunk=chunk))
    nat = list(native_flat_chunks([str(name)], k, chunk=chunk, fmt=fmt))
    chunks_equal_modulo_invalid(nat, py, k)


def test_native_threads_same_multiset(tmp_path):
    """-T > 1: files parse concurrently; the k-mer *multiset* is
    identical to single-threaded (block interleave may reorder)."""
    rng = random.Random(7)
    files = []
    for j in range(4):
        f = tmp_path / f"r{j}.fa"
        f.write_text("".join(
            f">s{i}\n{rand_seq(rng, 80)}\n" for i in range(30)))
        files.append(str(f))
    k = 11

    def kmer_multiset(chunks):
        from collections import Counter

        c = Counter()
        for arr in chunks:
            n = len(arr) - k + 1
            for p in range(n):
                w = arr[p : p + k]
                if (w < 4).all():
                    c[tuple(w.tolist())] += 1
        return c

    one = kmer_multiset(native_flat_chunks(files, k, chunk=512, threads=1))
    four = kmer_multiset(native_flat_chunks(files, k, chunk=512, threads=4))
    assert one == four and len(one) > 0


def test_native_packed_matches_host_pack(tmp_path):
    """gossio_next_packed == pack_chunk(gossio_next_chunk) bit-for-bit."""
    from gossamer_tpu.io.native import native_packed_chunks
    from gossamer_tpu.io.stream import pack_chunk

    rng = random.Random(21)
    f = tmp_path / "r.fa"
    f.write_text("".join(
        f">s{i}\n{rand_seq(rng, 70, with_n=True)}\n" for i in range(40)))
    k = 13
    chunk = 256
    raw = list(native_flat_chunks([str(f)], k, chunk=chunk))
    packed = list(native_packed_chunks([str(f)], k, chunk=chunk))
    assert len(raw) == len(packed)
    for codes, (words, inval) in zip(raw, packed):
        w2, v2 = pack_chunk(codes, k, chunk)
        np.testing.assert_array_equal(words, w2)
        np.testing.assert_array_equal(inval, v2)


def test_native_multi_file_and_sniff(tmp_path):
    rng = random.Random(99)
    r1 = [rand_seq(rng, 60) for _ in range(10)]
    r2 = [rand_seq(rng, 60) for _ in range(10)]
    f1 = tmp_path / "a.fa"
    f2 = tmp_path / "b.fq"
    f1.write_text("".join(f">x{i}\n{s}\n" for i, s in enumerate(r1)))
    f2.write_text("".join(f"@y{i}\n{s}\n+\n{'I' * 60}\n" for i, s in enumerate(r2)))
    k = 11
    reads = list(read_file(str(f1), fmt="fasta")) + list(read_file(str(f2), fmt="fastq"))
    py = list(flat_code_chunks(iter(reads), k, chunk=128))
    nat = list(native_flat_chunks([str(f1), str(f2)], k, chunk=128))
    chunks_equal_modulo_invalid(nat, py, k)


def test_spill_codec_round_trip():
    """Varint-delta spill codec (the reference's EdgeAndCount design,
    src/EdgeAndCount.hh:78-112): exact round trip + ~5 B/key density."""
    import numpy as np
    from gossamer_tpu.io.native import (decode_spill_run, encode_spill_run,
                                        load_library)

    if load_library() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    lo = np.unique(rng.integers(0, 1 << 52, 200_000, dtype=np.uint64))
    c = rng.integers(1, 1 << 20, len(lo)).astype(np.int64)
    enc = encode_spill_run(lo, c)
    # sparse keys (mean delta ~2^34) + 20-bit counts: ~8 B/key < 16 raw
    assert len(enc) < 9 * len(lo)
    glo, gc = decode_spill_run(enc, len(lo))
    assert np.array_equal(glo, lo) and np.array_equal(gc, c)
    # empty run
    e2 = encode_spill_run(lo[:0], c[:0])
    l2, c2 = decode_spill_run(e2, 0)
    assert len(l2) == 0 and len(c2) == 0


def test_spill_codec128_round_trip():
    import numpy as np
    from gossamer_tpu.io.native import (decode_spill_run128,
                                        encode_spill_run128, load_library)

    if load_library() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    lo = rng.integers(0, 1 << 63, 100_000, dtype=np.uint64)
    hi = rng.integers(0, 1 << 60, 100_000, dtype=np.uint64)
    order = np.lexsort((lo, hi))
    lo, hi = lo[order], hi[order]
    keep = np.ones(len(lo), bool)
    keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    lo, hi = lo[keep], hi[keep]
    c = rng.integers(1, 1000, len(lo)).astype(np.int64)
    enc = encode_spill_run128(lo, hi, c)
    glo, ghi, gc = decode_spill_run128(enc, len(lo))
    assert np.array_equal(glo, lo) and np.array_equal(ghi, hi)
    assert np.array_equal(gc, c)
