"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: 2-bit pack throughput in nucleotides/second on one chip, vs the
BASELINE.json target of 1e9 nt/s/chip (the reference publishes no absolute
throughput - see BASELINE.md - so the target is the baseline).

Methodology: per-dispatch latency through a tunneled TPU runtime can swing
from microseconds to tens of milliseconds between runs, so each kernel
bench runs K iterations INSIDE one compiled program (lax.fori_loop over
disjoint slices of a large resident buffer, results folded into a scalar
so nothing is dead-code-eliminated or loop-hoisted).  One dispatch is
amortized over K real passes; best-of-rounds filters residual noise.

Also measured (in "extra"): row-wise hamming pairs/s, all-pairs (Pallas
kernel) pairs/s, end-to-end dedup reads/s - the BASELINE.json metric list.
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


def _best_of(fn, *args, rounds=4):
    jax.block_until_ready(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_pack(n=1 << 20, width=160, k=16):
    """Fused pack+validate over k disjoint [n, width] slices per dispatch."""
    from shortseq_tpu.ops.bitpack import pack_and_validate

    big_a, big_l = _make_batch(k * n, width)
    big_a = jnp.asarray(big_a)
    big_l = jnp.asarray(big_l)

    @jax.jit
    def loop(a_all, l_all):
        def body(i, acc):
            a = jax.lax.dynamic_slice_in_dim(a_all, i * n, n, 0)
            l = jax.lax.dynamic_slice_in_dim(l_all, i * n, n, 0)
            w, ok = pack_and_validate(a, l)
            return (acc + jnp.sum(w, dtype=jnp.uint32)
                    + jnp.sum(ok).astype(jnp.uint32))
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    dt = _best_of(loop, big_a, big_l)
    return k * n * width / dt


def bench_hamming(n=1 << 20, lanes=6, k=16):
    from shortseq_tpu.ops.hamming import hamming_rows

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 2**32, size=(k * n, lanes),
                                 dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=(k * n, lanes),
                                 dtype=np.uint64).astype(np.uint32))

    @jax.jit
    def loop(a_all, b_all):
        def body(i, acc):
            x = jax.lax.dynamic_slice_in_dim(a_all, i * n, n, 0)
            y = jax.lax.dynamic_slice_in_dim(b_all, i * n, n, 0)
            return acc + jnp.sum(hamming_rows(x, y))
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    dt = _best_of(loop, a, b)
    return k * n / dt


def bench_pairwise(n=4096, lanes=2, k=8):
    """All-pairs hamming via the tiled Pallas kernel: k slabs of n^2 pairs
    per dispatch."""
    from shortseq_tpu.ops.pallas_kernels import hamming_pairwise_tiled

    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.integers(0, 2**32, size=(k * n, lanes),
                                 dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=(n, lanes),
                                 dtype=np.uint64).astype(np.uint32))

    @jax.jit
    def loop(a_all, b_one):
        def body(i, acc):
            x = jax.lax.dynamic_slice_in_dim(a_all, i * n, n, 0)
            return acc + jnp.sum(hamming_pairwise_tiled(x, b_one))
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    try:
        dt = _best_of(loop, a, b)
    except Exception:
        return None  # off-TPU fallback: kernel unavailable
    return k * n * n / dt


def bench_dedup(n=1 << 20, width=32, k=4):
    """Pack + sort-unique-count, k disjoint shards per dispatch."""
    from shortseq_tpu.count.device import unique_count
    from shortseq_tpu.ops.bitpack import pack_words

    rng = np.random.default_rng(2)
    pool, _ = _make_batch(n // 4, width, seed=3)
    idx = rng.integers(0, n // 4, size=k * n)
    big_a = jnp.asarray(pool[idx])
    big_l = jnp.asarray(np.full(k * n, width, np.int32))

    @jax.jit
    def loop(a_all, l_all):
        def body(i, acc):
            a = jax.lax.dynamic_slice_in_dim(a_all, i * n, n, 0)
            l = jax.lax.dynamic_slice_in_dim(l_all, i * n, n, 0)
            _, _, counts, n_u = unique_count(
                pack_words(a), l, jnp.ones(n, jnp.int32))
            return acc + jnp.sum(counts) + n_u
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    dt = _best_of(loop, big_a, big_l, rounds=3)
    return k * n / dt


def bench_dispatch(width=160, n=1 << 16):
    """Per-dispatch wall time for a small pack call - isolates the runtime
    dispatch/tunnel latency the looped benches amortize away."""
    from shortseq_tpu.ops.bitpack import pack_and_validate

    a, l = _make_batch(n, width)
    a, l = jnp.asarray(a), jnp.asarray(l)
    jax.block_until_ready(pack_and_validate(a, l))
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(pack_and_validate(a, l))
        best = min(best, time.perf_counter() - t0)
    return best


def _try(fn, *args):
    try:
        return fn(*args)
    except Exception as e:  # one failed bench must not kill the report
        return f"error: {type(e).__name__}: {e}"[:200]


def main():
    from shortseq_tpu.utils.warmup import start_transfer_warmup

    start_transfer_warmup()
    nt_per_s = _try(bench_pack)
    extra = {
        "hamming_pairs_per_s": _try(bench_hamming),
        "pairwise_hamming_pairs_per_s": _try(bench_pairwise),
        "dedup_reads_per_s": _try(bench_dedup),
        "dispatch_latency_s": _try(bench_dispatch),
        "backend": _try(lambda: jax.devices()[0].platform),
    }
    ok = isinstance(nt_per_s, float)
    print(json.dumps({
        "metric": "pack_nt_per_s_chip",
        "value": nt_per_s if ok else 0.0,
        "unit": "nt/s",
        "vs_baseline": (nt_per_s / BASELINE_NT_PER_S) if ok else 0.0,
        "extra": extra if ok else {**extra, "pack_error": nt_per_s},
    }))


if __name__ == "__main__":
    main()
