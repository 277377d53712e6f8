"""Object-API parity suite.

Re-implements the reference's test oracles (reference
shortseq/tests/unit_tests_main.py - randomized property tests against pure
Python string operations) over every backend available, trimmed to keep CI
fast while still covering every length domain, boundary, and narrowing rule.
"""

import random
import sys

import pytest

import shortseq_tpu.api.seq as pyseq

BACKENDS = {"python": pyseq}
from shortseq_tpu.native_build import load as _load_native

_native = _load_native()
if _native is not None:
    BACKENDS["native"] = _native

MIN_64_NT, MAX_64_NT = 0, 32
MIN_192_NT, MAX_192_NT = 33, 96
MIN_VAR_NT, MAX_VAR_NT = 97, 1024


@pytest.fixture(params=sorted(BACKENDS))
def sq(request):
    return BACKENDS[request.param]


def rand_seq(rng, length):
    return "".join(rng.choice("ACTG") for _ in range(length))


def str_ham(a, b):
    return sum(x != y for x, y in zip(a, b))


@pytest.fixture
def rng():
    return random.Random(1234)


class TestEmptyAndSingletons:
    def test_empty_seq(self, sq):
        seq_u = sq.pack("")
        seq_b = sq.pack(b"")
        assert seq_b == seq_u
        assert seq_b is seq_u                 # singleton (short_seq.pyx:7)
        assert str(seq_b) == ""
        assert seq_u == ""
        assert len(seq_u) == 0
        assert hash(seq_u) == 0

    def test_zero_length_slice_singleton(self, sq, rng):
        ids = set()
        for length in (MAX_64_NT, MAX_192_NT, MAX_VAR_NT):
            s = sq.pack(rand_seq(rng, length))
            for i in range(0, length, 7):
                zls = s[i:i]
                ids.add(id(zls))
                assert zls == ""
        assert len(ids) == 1


class TestConstruction:
    def test_single_bases(self, sq):
        bases = [sq.from_str(b) for b in "ATGC"]
        assert bases == list("ATGC")
        assert [str(b) for b in bases] == list("ATGC")
        assert all(type(b) is sq.ShortSeq64 for b in bases)
        bases_b = [sq.from_bytes(b.encode()) for b in "ATGC"]
        assert [str(b) for b in bases_b] == list("ATGC")

    def test_subtype_for_length(self, sq):
        assert type(sq.pack("A" * 32)) is sq.ShortSeq64
        assert type(sq.pack("A" * 33)) is sq.ShortSeq192
        assert type(sq.pack("A" * 96)) is sq.ShortSeq192
        assert type(sq.pack("A" * 97)) is sq.ShortSeqVar
        assert type(sq.pack("A" * 1024)) is sq.ShortSeqVar

    def test_max_length_enforced(self, sq):
        max_seq = "ATGC" * 256
        assert str(sq.pack(max_seq)) == max_seq
        with pytest.raises(Exception, match=r"longer than 1024 bases"):
            sq.pack(max_seq + "A")

    def test_pack_passthrough_and_typeerror(self, sq):
        s = sq.pack("ACGT")
        assert sq.pack(s) is s
        with pytest.raises(TypeError, match="Cannot pack"):
            sq.pack(42)
        with pytest.raises(TypeError, match="Cannot pack"):
            sq.pack(["ACGT"])

    def test_incompatible_chars(self, sq):
        problems = ["N", "*", "n", "a", "U"]
        for p in problems:
            for length in (1, 33, 97):
                probe = "ACGT" * ((length // 4) + 1)
                bad = (probe[: length - 1] + p)[:length]
                with pytest.raises(Exception, match="Unsupported base character"):
                    sq.pack(bad)

    def test_roundtrip_all_lengths(self, sq, rng):
        for length in range(0, MAX_VAR_NT + 1):
            sample = rand_seq(rng, length)
            s = sq.pack(sample)
            assert len(s) == length
            assert str(s) == sample
            assert s == sample


class TestHashEq:
    def test_hash_is_first_word(self, sq):
        # ATGC codes 0,2,3,1 LSB-first = 0x78
        assert hash(sq.pack("ATGC")) == 0x78
        # hash of len-1 'A' collides with empty, distinguished by __eq__
        assert hash(sq.pack("A")) == 0
        assert sq.pack("A") != sq.pack("")

    def test_hash_int64_reinterpret(self, sq):
        # 32 G's -> packed = 2^64 - 1 -> Py_hash_t -1 -> CPython maps to -2
        assert hash(sq.pack("G" * 32)) == -2
        # 'T' at position 31 sets bit 63 -> negative hash
        s = "A" * 31 + "G"
        h = hash(sq.pack(s))
        assert h < 0

    def test_eq_same_type(self, sq, rng):
        for length in (5, 40, 200):
            a = rand_seq(rng, length)
            assert sq.pack(a) == sq.pack(a)
            b = a[:-1] + ("A" if a[-1] != "A" else "C")
            assert sq.pack(a) != sq.pack(b)

    def test_eq_str(self, sq, rng):
        for length in (5, 40, 200):
            a = rand_seq(rng, length)
            assert sq.pack(a) == a
            assert sq.pack(a) != a + "A"
            assert not (sq.pack(a) == 12345)

    def test_eq_cross_type_false(self, sq):
        assert sq.pack("A" * 32) != sq.pack("A" * 33)


class TestSizes:
    def test_sizes(self, sq, rng):
        assert sys.getsizeof(sq.pack(rand_seq(rng, 1))) == 32
        assert sys.getsizeof(sq.pack(rand_seq(rng, MAX_64_NT))) == 32
        assert sys.getsizeof(sq.pack(rand_seq(rng, MIN_192_NT))) == 48
        assert sys.getsizeof(sq.pack(rand_seq(rng, MAX_192_NT))) == 48
        assert sys.getsizeof(sq.pack(rand_seq(rng, MIN_VAR_NT))) == 64
        assert sys.getsizeof(sq.pack(rand_seq(rng, MAX_VAR_NT))) == 288


class TestSubscript:
    @pytest.mark.parametrize("length", [1, 7, 32, 33, 96, 97, 130, 1024])
    def test_subscript(self, sq, rng, length):
        sample = rand_seq(rng, length)
        s = sq.pack(sample)
        for i in range(length):
            assert s[i] == sample[i]
            assert s[-i] == sample[-i]
            assert type(s[i]) is sq.ShortSeq64
            assert len(s[i]) == 1
        for oob in (length + 1, -length - 1):
            with pytest.raises(IndexError):
                _ = s[oob]

    def test_invalid_index_type(self, sq):
        with pytest.raises(TypeError, match="Invalid index type"):
            _ = sq.pack("ACGT")["x"]

    def test_step_not_supported(self, sq):
        with pytest.raises(TypeError, match="Slice step not supported"):
            _ = sq.pack("ACGTACGT")[::2]


class TestSlicing:
    @pytest.mark.parametrize("length", [32, 96, 97, 1024])
    def test_slice_edges(self, sq, rng, length):
        sample = rand_seq(rng, length)
        s = sq.pack(sample)
        assert str(s[:]) == sample
        for i in range(length):
            assert str(s[:i]) == sample[:i]
            assert str(s[:-i]) == sample[:-i]
            assert str(s[i:]) == sample[i:]
            assert str(s[-i:]) == sample[-i:]

    def test_narrowing_var(self, sq, rng):
        sample = rand_seq(rng, MAX_VAR_NT)
        s = sq.pack(sample)
        cases = [
            (slice(1, -1), sq.ShortSeqVar),
            (slice(5, 5 + 96), sq.ShortSeq192),
            (slice(40, 40 + 33), sq.ShortSeq192),
            (slice(40, 40 + 32), sq.ShortSeq64),
            (slice(1000, 1002), sq.ShortSeq64),
            (slice(7, 8), sq.ShortSeq64),
        ]
        for slc, cls in cases:
            piece = s[slc]
            assert type(piece) is cls
            assert str(piece) == sample[slc]

    def test_narrowing_192(self, sq, rng):
        sample = rand_seq(rng, MAX_192_NT)
        s = sq.pack(sample)
        for start in range(0, 60, 3):
            for ln in (2, 17, 32, 33, 60):
                piece = s[start : start + ln]
                expect = sample[start : start + ln]
                assert str(piece) == expect
                if len(expect) <= 32:
                    assert type(piece) is sq.ShortSeq64

    def test_stochastic_slices(self, sq, rng):
        sample = rand_seq(rng, MAX_VAR_NT)
        s = sq.pack(sample)
        for _ in range(3000):
            a = rng.randint(0, MAX_VAR_NT // 2)
            b = rng.randint(a, a + rng.randint(1, MAX_VAR_NT - a))
            assert str(s[a:b]) == sample[a:b], f"slice [{a}:{b}]"

    def test_slice_then_hamming(self, sq, rng):
        comp = {"A": "T", "T": "A", "G": "C", "C": "G"}
        a = rand_seq(rng, MAX_VAR_NT)
        b = comp[a[0]] + a[1:-1] + comp[a[-1]]
        sa, sb = sq.pack(a), sq.pack(b)
        assert sa ^ sb == 2
        assert sa[1:] ^ sb[1:] == 1
        assert sa[:-1] ^ sb[:-1] == 1
        assert sa[1:-1] ^ sb[1:-1] == 0


class TestHamming:
    def test_all_domains(self, sq, rng):
        for length in list(range(0, 97)) + [97, 128, 500, 1023, 1024]:
            a, b = rand_seq(rng, length), rand_seq(rng, length)
            assert sq.pack(a) ^ sq.pack(b) == str_ham(a, b)

    def test_length_mismatch_raises(self, sq):
        with pytest.raises(Exception, match="equal length"):
            sq.pack("ACGT") ^ sq.pack("ACG")

    def test_type_mismatch_raises(self, sq):
        with pytest.raises(TypeError):
            sq.pack("A" * 10) ^ sq.pack("A" * 40)


class TestRepr:
    def test_repr_formats(self, sq, rng):
        s64 = sq.pack("ACGT")
        assert repr(s64) == "<ShortSeq64 (4 nt): ACGT>"
        s192 = sq.pack("A" * 40)
        assert repr(s192) == f"<ShortSeq192 (40 nt): {'A' * 40}>"
        sample = rand_seq(rng, 200)
        svar = sq.pack(sample)
        assert repr(svar) == f"<ShortSeqVar (200 nt): {sample[:75]} ... >"


class TestReadme:
    def test_readme_example(self, sq):
        """The reference README example, enshrined as a test
        (unit_tests_main.py:465-491)."""
        from shortseq_tpu import ShortSeqCounter

        seq_str = "ATGC"
        seq_bytes = b"ATGC"
        seq_1 = sq.pack(seq_str)
        seq_2 = sq.pack(seq_bytes)

        assert seq_1 == seq_2 == seq_str
        assert len(seq_1) == len(seq_2) == len(seq_str)

        seq_3 = sq.pack("TATTAGCGATTGACAGTTGTCCTGTAATAACGCCGGGTAAATTTGCCG")
        seq_4 = sq.pack("TATTACCGATTGACAGTTGTCCTGTAATAACGGCGGGTAAATTTGCTG")
        s = str(seq_4)

        assert seq_4[5:15] == s[5:15]
        assert seq_4[-2] == s[-2]

        hammd = sum(a != b for a, b in zip(str(seq_3), str(seq_4)))
        assert seq_3 ^ seq_4 == hammd == 3

        # The counter materializes keys with the package's resolved backend,
        # so the expected key must come from that same backend (a python-
        # backend object and a native one are distinct key identities).
        import shortseq_tpu

        counts = ShortSeqCounter([seq_bytes] * 10)
        assert counts == {shortseq_tpu.pack("ATGC"): 10}
