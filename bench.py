"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: 2-bit pack throughput in nucleotides/second on one chip, vs the
BASELINE.json target of 1e9 nt/s/chip (the reference publishes no absolute
throughput - see BASELINE.md - so the target is the baseline).

Also measures (reported inside "extra", not the headline line fields):
hamming pairs/s and end-to-end dedup reads/s, mirroring BASELINE.json's
metric list.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_NT_PER_S = 1e9


def _make_batch(n, width, seed=0):
    rng = np.random.default_rng(seed)
    lengths = np.full(n, width, dtype=np.int32)
    codes = rng.integers(0, 4, size=(n, width)).astype(np.uint8)
    ascii_mat = np.frombuffer(b"ACTG", dtype=np.uint8)[codes]
    return ascii_mat.astype(np.uint8), lengths


def _time(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_pack(n=65536, width=160):
    from shortseq_tpu.ops.bitpack import pack_and_validate

    ascii_mat, lengths = _make_batch(n, width)
    a = jnp.asarray(ascii_mat)
    l = jnp.asarray(lengths)
    dt = _time(pack_and_validate, a, l)
    return n * width / dt


def bench_hamming(n=65536, lanes=6):
    from shortseq_tpu.ops.hamming import hamming_rows

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 2**32, size=(n, lanes), dtype=np.uint64)
                    .astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=(n, lanes), dtype=np.uint64)
                    .astype(np.uint32))
    dt = _time(hamming_rows, a, b)
    return n / dt


def bench_dedup(n=1 << 18, width=32):
    from shortseq_tpu.count.device import unique_count
    from shortseq_tpu.ops.bitpack import pack_words

    rng = np.random.default_rng(2)
    # ~25% unique, realistic dedup mix
    pool, pool_lens = _make_batch(n // 4, width, seed=3)
    idx = rng.integers(0, n // 4, size=n)
    ascii_mat = jnp.asarray(pool[idx])
    lengths = jnp.asarray(pool_lens[idx])

    @jax.jit
    def dedup(a, l):
        return unique_count(pack_words(a), l, jnp.ones(a.shape[0], jnp.int32))

    dt = _time(dedup, ascii_mat, lengths, iters=5)
    return n / dt


def main():
    from shortseq_tpu.utils.warmup import start_transfer_warmup

    start_transfer_warmup()
    nt_per_s = bench_pack()
    extra = {
        "hamming_pairs_per_s": bench_hamming(),
        "dedup_reads_per_s": bench_dedup(),
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps({
        "metric": "pack_nt_per_s_chip",
        "value": nt_per_s,
        "unit": "nt/s",
        "vs_baseline": nt_per_s / BASELINE_NT_PER_S,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
