"""Throughput/parity harness in the reference's profiling-test shape
(reference tests/unit_tests_profiling.py): the long benchmark is
skip-gated exactly like the reference's (:107,140), while the quick
multiset-parity check - the dedup oracle the reference asserts at :136 -
always runs."""

import collections
import random

import pytest

import shortseq_tpu as sq


def make_reads(n, lo=15, hi=32, seed=7, dup_factor=4):
    rng = random.Random(seed)
    pool = ["".join(rng.choices("ACTG", k=rng.randint(lo, hi)))
            for _ in range(max(1, n // dup_factor))]
    return [pool[rng.randrange(len(pool))] for _ in range(n)]


class TestDedupParity:
    def test_count_multiset_equality(self):
        """sorted(values) parity vs collections.Counter
        (unit_tests_profiling.py:136)."""
        reads = make_reads(5000)
        c_ref = collections.Counter(r.encode() for r in reads)
        c_sq = sq.ShortSeqCounter([r.encode() for r in reads])
        assert sorted(c_sq.values()) == sorted(c_ref.values())

    def test_batch_counts_multiset_equality(self):
        reads = make_reads(5000)
        c_ref = collections.Counter(reads)
        c_dev = sq.pack_batch(reads).counts()
        assert sorted(c_dev.values()) == sorted(c_ref.values())
        assert sum(c_dev.values()) == len(reads)

    @pytest.mark.skip(reason="long benchmark; run benchmarks/benchmark.py")
    def test_profile_large(self):
        reads = make_reads(10_000_000)
        sq.pack_batch(reads).counts()
