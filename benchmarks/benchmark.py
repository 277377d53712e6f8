"""Reference-shaped benchmark suite (reference tests/benchmark.py:44-165):
memory by length, construction time, hamming time - plus the TPU-native
batch throughputs the reference cannot express.  Results are printed as
aligned tables and saved as a timestamped .txt next to this file
(mirroring the reference's benchmarks/*/*.txt flow, :207-275).

Run: python benchmarks/benchmark.py [--quick]
"""

from __future__ import annotations

import argparse
import random
import sys
import time
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def rand_seq(rng, length):
    return "".join(rng.choice("ACTG") for _ in range(length))


def bench_memory_by_length(out):
    """Object bytes per sequence length vs str/bytes (the reference's
    mem_by_length plot, benchmark.py:44-79)."""
    import shortseq_tpu as sq

    rng = random.Random(0)
    print("\n== memory by length (bytes/object) ==", file=out)
    print(f"{'nt':>5} {'ShortSeq':>9} {'str':>6} {'bytes':>6} {'saving':>7}",
          file=out)
    for length in (1, 16, 32, 33, 64, 96, 97, 256, 512, 1024):
        s = rand_seq(rng, length)
        obj = sys.getsizeof(sq.pack(s))
        st = sys.getsizeof(s)
        by = sys.getsizeof(s.encode())
        print(f"{length:>5} {obj:>9} {st:>6} {by:>6} "
              f"{100 * (1 - obj / st):>6.1f}%", file=out)


def bench_construction(out, n=20000):
    """Scalar construction time from bytes (reference benchmark.py:88-123
    asserts the microsecond scale) and batched construction throughput."""
    import shortseq_tpu as sq

    rng = random.Random(1)
    print("\n== construction from bytes ==", file=out)
    for length in (16, 32, 64, 96, 256, 1024):
        data = [rand_seq(rng, length).encode() for _ in range(n)]
        t0 = time.perf_counter()
        for b in data:
            sq.from_bytes(b)
        dt = (time.perf_counter() - t0) / n
        print(f"{length:>5} nt: {dt * 1e6:>8.2f} us/seq  "
              f"({sq.BACKEND} objects)", file=out)

    print("\n== batched device pack (PackedBatch) ==", file=out)
    import jax

    for length in (32, 96, 160):
        seqs = [rand_seq(rng, length) for _ in range(n)]
        sq.pack_batch(seqs)  # compile
        t0 = time.perf_counter()
        b = sq.pack_batch(seqs)
        jax.block_until_ready(b.words)
        dt = time.perf_counter() - t0
        print(f"{length:>5} nt x {n}: {n * length / dt / 1e9:>6.2f} B nt/s "
              f"(incl. host staging)", file=out)


def bench_hamming(out, n=20000):
    """Hamming time: scalar objects vs str-zip oracle vs batched device
    rows (reference benchmark.py:125-165's comparison shape)."""
    import jax

    import shortseq_tpu as sq

    rng = random.Random(2)
    print("\n== hamming distance ==", file=out)
    for length in (32, 96, 512):
        a = [rand_seq(rng, length) for _ in range(n)]
        b = [rand_seq(rng, length) for _ in range(n)]
        pa = [sq.pack(s) for s in a]
        pb = [sq.pack(s) for s in b]

        t0 = time.perf_counter()
        for x, y in zip(pa, pb):
            x ^ y
        t_obj = (time.perf_counter() - t0) / n

        t0 = time.perf_counter()
        for x, y in zip(a[:2000], b[:2000]):
            sum(c != d for c, d in zip(x, y))
        t_str = (time.perf_counter() - t0) / 2000

        ba, bb = sq.pack_batch(a), sq.pack_batch(b)
        ba.hamming(bb)  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(ba.hamming(bb))
        t_dev = (time.perf_counter() - t0) / n

        print(f"{length:>5} nt: object {t_obj * 1e9:>8.1f} ns  "
              f"str-zip {t_str * 1e9:>10.1f} ns  "
              f"device-row {t_dev * 1e9:>8.1f} ns", file=out)


def bench_dedup(out, n=1 << 18):
    """End-to-end dedup throughput vs collections.Counter
    (reference unit_tests_profiling.py:107-136's comparison)."""
    import collections

    import numpy as np

    import shortseq_tpu as sq
    from shortseq_tpu.batch import PackedBatch

    rng = np.random.default_rng(3)
    pool = ["".join(random.Random(i).choices("ACTG", k=24))
            for i in range(n // 8)]
    reads = [pool[i] for i in rng.integers(0, len(pool), n)]

    t0 = time.perf_counter()
    c_py = collections.Counter(reads)
    t_py = time.perf_counter() - t0

    batch = PackedBatch.from_seqs(reads[:1024])  # compile
    batch.counts()
    t0 = time.perf_counter()
    c_dev = PackedBatch.from_seqs(reads).counts()
    t_dev = time.perf_counter() - t0

    assert sorted(c_dev.values()) == sorted(c_py.values()), "dedup mismatch"
    print(f"\n== dedup {n} reads ({len(c_py)} unique) ==", file=out)
    print(f"collections.Counter: {n / t_py / 1e6:>6.2f} M reads/s", file=out)
    print(f"device sort-unique : {n / t_dev / 1e6:>6.2f} M reads/s "
          f"(incl. host staging + Counter materialization)", file=out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    from shortseq_tpu.utils.warmup import start_transfer_warmup

    start_transfer_warmup()
    n = 2000 if args.quick else 20000

    class Tee:
        def __init__(self, *files):
            self.files = files

        def write(self, s):
            for f in self.files:
                f.write(s)

        def flush(self):
            for f in self.files:
                f.flush()

    stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    out_path = Path(__file__).parent / f"results-{stamp}.txt"
    with open(out_path, "w") as f:
        out = Tee(sys.stdout, f)
        bench_memory_by_length(out)
        bench_construction(out, n)
        bench_hamming(out, n)
        bench_dedup(out, 1 << (14 if args.quick else 18))
    print(f"\nsaved {out_path}")


if __name__ == "__main__":
    main()
