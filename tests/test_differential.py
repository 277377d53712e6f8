"""Differential fuzzing: the native C extension and the pure-Python object
layer must agree operation-for-operation (values, types, error classes and
messages) on randomized inputs, and both must agree with the string oracle.
"""

import random

import pytest

import shortseq_tpu.api.seq as pyseq
from shortseq_tpu.native_build import load as _load_native

nat = _load_native()

pytestmark = pytest.mark.skipif(nat is None, reason="native ext unavailable")


def _outcome(fn):
    """Run fn, capturing (kind, value) so successes and failures compare."""
    try:
        return ("ok", fn())
    except Exception as e:
        return ("err", type(e).__name__, str(e))


def _rand_seq(rng, length):
    return "".join(rng.choice("ACTG") for _ in range(length))


class TestBackendsAgree:
    def test_construct_decode_hash_sizeof(self):
        rng = random.Random(42)
        import sys

        for _ in range(300):
            s = _rand_seq(rng, rng.randint(0, 1024))
            a, b = nat.pack(s), pyseq.pack(s)
            assert str(a) == str(b) == s
            assert hash(a) == hash(b)
            assert len(a) == len(b)
            assert sys.getsizeof(a) == sys.getsizeof(b)
            assert type(a).__name__ == type(b).__name__
            assert repr(a) == repr(b)

    def test_slices_agree(self):
        rng = random.Random(43)
        for _ in range(200):
            s = _rand_seq(rng, rng.randint(1, 300))
            a, b = nat.pack(s), pyseq.pack(s)
            start = rng.randint(-len(s) - 2, len(s) + 2)
            stop = rng.randint(-len(s) - 2, len(s) + 2)
            ra = _outcome(lambda: str(a[start:stop]))
            rb = _outcome(lambda: str(b[start:stop]))
            assert ra == rb == ("ok", s[start:stop])
            idx = rng.randint(-len(s) - 2, len(s) + 2)
            ra = _outcome(lambda: str(a[idx]))
            rb = _outcome(lambda: str(b[idx]))
            assert ra == rb

    def test_hamming_agree(self):
        rng = random.Random(44)
        for _ in range(200):
            n = rng.randint(1, 200)
            s1, s2 = _rand_seq(rng, n), _rand_seq(rng, n)
            want = sum(x != y for x, y in zip(s1, s2))
            assert nat.pack(s1) ^ nat.pack(s2) == want
            assert pyseq.pack(s1) ^ pyseq.pack(s2) == want

    def test_errors_agree(self):
        cases = [
            lambda m: m.pack("ACGNT"),
            lambda m: m.pack("acgt"),
            lambda m: m.pack("ACGU"),
            lambda m: m.pack("A" * 1025),
            lambda m: m.pack(12345),
            lambda m: m.pack("ACGTACGT")[::2],
            lambda m: m.pack("ACGT")[1.5],
            lambda m: m.pack("ACG") ^ m.pack("ACGT"),
        ]
        for case in cases:
            ra = _outcome(lambda: case(nat))
            rb = _outcome(lambda: case(pyseq))
            assert ra[0] == rb[0] == "err"
            assert ra[1] == rb[1], (ra, rb)  # same exception class

    def test_eq_matrix(self):
        rng = random.Random(45)
        seqs = [_rand_seq(rng, rng.randint(0, 120)) for _ in range(30)]
        for s1 in seqs[:10]:
            for s2 in seqs[:10]:
                want = s1 == s2
                assert (nat.pack(s1) == nat.pack(s2)) == want
                assert (pyseq.pack(s1) == pyseq.pack(s2)) == want
                assert (nat.pack(s1) == s2) == want
                assert (pyseq.pack(s1) == s2) == want
                # Reference parity quirk: equality against bytes is always
                # False (the reference compares str(self) == bytes).
                assert (nat.pack(s1) == s2.encode()) is False
                assert (pyseq.pack(s1) == s2.encode()) is False

    def test_iteration_agrees(self):
        rng = random.Random(46)
        for _ in range(20):
            s = _rand_seq(rng, rng.randint(0, 150))
            assert [str(c) for c in nat.pack(s)] == list(s)
            assert [str(c) for c in pyseq.pack(s)] == list(s)
