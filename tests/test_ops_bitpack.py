"""Device pack/unpack/validate/hamming vs the pure-Python oracle.

The oracle (shortseq_tpu/oracle.py) implements the reference's exact
bit-level semantics; these tests pin the jnp ops to it, including the
uint64 -> 2xuint32 lane split.
"""

import numpy as np
import pytest

from shortseq_tpu import oracle
from shortseq_tpu.constants import lanes_for_length
from shortseq_tpu.ops import (
    first_bad_byte,
    hamming_pairwise,
    hamming_rows,
    pack_words,
    unpack_ascii,
    validate,
)
from tests.conftest import rand_sequence


def to_matrix(seqs, width_nts):
    """Pad a list of byte strings into [N, width] uint8 + lengths."""
    n = len(seqs)
    mat = np.zeros((n, width_nts), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(seqs):
        mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lengths[i] = len(s)
    return mat, lengths


def oracle_lanes(seqs, n_lanes):
    out = np.zeros((len(seqs), n_lanes), dtype=np.uint32)
    for i, s in enumerate(seqs):
        blocks = oracle.encode_bytes(s)
        out[i] = oracle.blocks_to_lanes(blocks, n_lanes)
    return out


@pytest.mark.parametrize("max_len", [16, 32, 96, 1024])
def test_pack_matches_oracle(rng, max_len):
    seqs = [rand_sequence(rng, rng.randint(1, max_len)).encode() for _ in range(64)]
    mat, lengths = to_matrix(seqs, max_len if max_len % 16 == 0 else max_len + 16)
    words = np.asarray(pack_words(mat))
    expect = oracle_lanes(seqs, words.shape[1])
    np.testing.assert_array_equal(words, expect)


def test_pack_golden_readme():
    # Frozen vectors from the reference README example (unit_tests_main.py:476)
    seqs = [
        b"ATGC",
        b"TATTAGCGATTGACAGTTGTCCTGTAATAACGCCGGGTAAATTTGCCG",
        b"TATTACCGATTGACAGTTGTCCTGTAATAACGGCGGGTAAATTTGCTG",
    ]
    mat, lengths = to_matrix(seqs, 48)
    words = np.asarray(pack_words(mat))
    expect = oracle_lanes(seqs, 3)
    np.testing.assert_array_equal(words, expect)
    # ATGC -> codes 0,2,3,1 LSB-first -> 0b01_11_10_00 = 0x78
    assert words[0, 0] == 0x78 and words[0, 1] == 0


def test_roundtrip(rng):
    seqs = [rand_sequence(rng, rng.randint(0, 128)).encode() for _ in range(32)]
    mat, lengths = to_matrix(seqs, 128)
    words = pack_words(mat)
    ascii_out = np.asarray(unpack_ascii(words))
    for i, s in enumerate(seqs):
        assert bytes(ascii_out[i, : len(s)].tobytes()) == s


def test_validate(rng):
    good = rand_sequence(rng, 20).encode()
    cases = [
        (good, True),
        (b"ACGTN", False),
        (b"acgt", False),        # lowercase rejected (util.pxd:88-96)
        (b"ACGU", False),        # U rejected by the bloom despite table_91
        (b"AC*T", False),
        (b"", True),
    ]
    mat, lengths = to_matrix([c[0] for c in cases], 32)
    ok = np.asarray(validate(mat, lengths))
    assert list(ok) == [c[1] for c in cases]
    # Oracle agreement on the same cases
    for seq, expect in cases:
        try:
            oracle.encode_bytes(seq)
            assert expect
        except Exception:
            assert not expect


def test_first_bad_byte():
    mat, lengths = to_matrix([b"ACGTN", b"NACGT", b"ACGT"], 16)
    idx = np.asarray(first_bad_byte(mat, lengths))
    assert list(idx) == [4, 0, 16]


def test_padding_is_not_validated():
    # Bytes past the row length are padding and must not affect validity
    # (the reference's marshalling loops never read them, util.pyx:78-94);
    # an interior NUL is before the length and fails the bloom.
    mat, lengths = to_matrix([b"ACGT"], 16)
    mat[0, 10] = ord("N")
    assert bool(np.asarray(validate(mat, lengths))[0])
    nul = to_matrix([b"AC\x00T"], 16)[0]
    assert not bool(np.asarray(validate(nul, lengths))[0])


@pytest.mark.parametrize("width", [32, 96, 160, 1024])
def test_folded_pack_matches_rows(rng, width):
    """pack_and_validate_rows (row-folded kernel) must agree bit-for-bit
    with the unfolded pack and the new-semantics validate for ragged
    lengths, invalid bytes, interior NULs, and padding violations."""
    import jax.numpy as jnp

    from shortseq_tpu.ops.bitpack import (
        fold_for,
        pack_and_validate_rows,
        pack_and_validate_u32,
        pack_words_u32,
        validate_u32,
    )

    n = 256
    w4 = width // 4
    fold = fold_for(w4, n)
    assert n % fold == 0
    assert fold == 1 if w4 >= 128 else fold * w4 >= 128
    mat = np.zeros((n, width), np.uint8)
    lengths = np.zeros(n, np.int32)
    pyrng = rng
    for i in range(n):
        ln = pyrng.randint(0, width)
        lengths[i] = ln
        mat[i, :ln] = np.frombuffer(
            rand_sequence(pyrng, ln).encode(), np.uint8)
    # corruption: bloom-fail bytes, interior NULs, and nonzero padding
    # (which the length-mask semantics must IGNORE)
    for i in range(0, n, 17):
        if lengths[i]:
            mat[i, pyrng.randrange(lengths[i])] = ord("N")
    for i in range(3, n, 31):
        if lengths[i] > 2:
            mat[i, 1] = 0
    for i in range(5, n, 37):
        if lengths[i] < width:
            mat[i, width - 1] = ord("N")
    u32 = np.ascontiguousarray(mat).view(np.uint32)
    words, ok = pack_and_validate_rows(u32, lengths)
    ref_w = np.asarray(pack_words_u32(jnp.asarray(u32)))
    ref_ok = np.asarray(validate_u32(jnp.asarray(u32), jnp.asarray(lengths)))
    # Contract (one-dot poison kernel, round 4): words are bit-exact for
    # VALID rows; rows with ok=False have unspecified words - every
    # caller raises or filters them, matching the reference, which
    # raises before packed words are observable (short_seq_64.pyx:105).
    assert (np.asarray(ok) == ref_ok).all()
    assert (np.asarray(words)[ref_ok] == ref_w[ref_ok]).all()
    assert not ref_ok.all() and ref_ok.any()
    # odd batch size: fold_for must fall back to a dividing fold
    words3, ok3 = pack_and_validate_rows(u32[:255], lengths[:255])
    assert (np.asarray(ok3) == ref_ok[:255]).all()
    assert (np.asarray(words3)[ref_ok[:255]] == ref_w[:255][ref_ok[:255]]).all()


@pytest.mark.parametrize("length", [1, 16, 31, 32, 33, 96, 97, 500, 1024])
def test_hamming_matches_string_oracle(rng, length):
    a = rand_sequence(rng, length)
    b = rand_sequence(rng, length)
    width = lanes_for_length(length) * 16
    width = max(16, -(-width // 16) * 16)
    mat, lengths = to_matrix([a.encode(), b.encode()], width)
    words = pack_words(mat)
    d = int(np.asarray(hamming_rows(words[0:1], words[1:2]))[0])
    assert d == oracle.str_hamming(a, b)
    blocks_a = oracle.encode_bytes(a.encode())
    blocks_b = oracle.encode_bytes(b.encode())
    assert d == oracle.hamming_blocks(blocks_a, blocks_b, length)


def test_hamming_pairwise(rng):
    seqs = [rand_sequence(rng, 24) for _ in range(8)]
    mat, lengths = to_matrix([s.encode() for s in seqs], 32)
    words = pack_words(mat)
    dm = np.asarray(hamming_pairwise(words, words))
    for i in range(8):
        for j in range(8):
            assert dm[i, j] == oracle.str_hamming(seqs[i], seqs[j])


class TestPairwiseMXU:
    @pytest.mark.parametrize("n,m,w", [(64, 96, 2), (33, 50, 6), (20, 20, 64)])
    def test_matches_xor_formulation(self, n, m, w):
        # The MXU dot formulation must be bit-exact vs XOR+popcount.
        import numpy as np

        from shortseq_tpu.ops import hamming_pairwise, hamming_pairwise_mxu

        rng = np.random.default_rng(n * w)
        a = rng.integers(0, 2**32, size=(n, w), dtype=np.uint64) \
            .astype(np.uint32)
        b = rng.integers(0, 2**32, size=(m, w), dtype=np.uint64) \
            .astype(np.uint32)
        got = np.asarray(hamming_pairwise_mxu(a, b))
        want = np.asarray(hamming_pairwise(a, b))
        assert (got == want).all()

    def test_extremes(self):
        import numpy as np

        from shortseq_tpu.ops import hamming_pairwise_mxu

        zero = np.zeros((2, 64), np.uint32)           # 1024 nt of 'A'
        ones = np.full((2, 64), 0xFFFFFFFF, np.uint32)  # 1024 nt of 'G'
        d = np.asarray(hamming_pairwise_mxu(zero, ones))
        assert (d == 1024).all()
        assert (np.asarray(hamming_pairwise_mxu(zero, zero)) == 0).all()


class TestOneDotPadValid:
    """Contract tests for the round-4 one-dot fused pack+validate
    (ops/bitpack.py pack_and_validate_folded): pad_valid=True skips
    length masking under the PAD_BYTE contract; both forms agree with
    the standalone validate on their respective contracts."""

    def _batch(self, n, width, seed=0, pad_byte=None):
        import numpy as np

        from shortseq_tpu.constants import PAD_BYTE

        pad_byte = PAD_BYTE if pad_byte is None else pad_byte
        rng = np.random.default_rng(seed)
        lengths = rng.integers(0, width + 1, size=n).astype(np.int32)
        codes = rng.integers(0, 4, size=(n, width)).astype(np.uint8)
        mat = np.frombuffer(b"ACTG", np.uint8)[codes].copy()
        col = np.arange(width)[None, :]
        mat[col >= lengths[:, None]] = pad_byte
        return mat, lengths

    @pytest.mark.parametrize("width", [32, 96, 160])
    def test_pad_valid_agrees_with_masked(self, width):
        import numpy as np

        from shortseq_tpu.ops.bitpack import pack_and_validate_rows

        mat, lengths = self._batch(512, width, seed=width)
        # bad bytes INSIDE rows must still be caught without the mask
        rng = np.random.default_rng(1)
        for i in range(0, 512, 13):
            if lengths[i]:
                mat[i, rng.integers(0, lengths[i])] = ord("N")
        u32 = np.ascontiguousarray(mat).view(np.uint32)
        w_m, ok_m = pack_and_validate_rows(u32, lengths)
        w_p, ok_p = pack_and_validate_rows(u32, lengths, pad_valid=True)
        ok_m, ok_p = np.asarray(ok_m), np.asarray(ok_p)
        assert (ok_m == ok_p).all()
        assert not ok_m.all() and ok_m.any()
        assert (np.asarray(w_m)[ok_m] == np.asarray(w_p)[ok_m]).all()

    def test_zero_padding_rejected_under_pad_valid(self):
        """A zero-padded matrix VIOLATES the pad_valid contract: byte 0
        fails the bloom, so ragged rows are rejected - the loud failure
        mode that catches a caller passing a foreign matrix with
        pad_valid=True."""
        import numpy as np

        from shortseq_tpu.ops.bitpack import pack_and_validate_rows

        mat, lengths = self._batch(256, 32, seed=3, pad_byte=0)
        u32 = np.ascontiguousarray(mat).view(np.uint32)
        _, ok_m = pack_and_validate_rows(u32, lengths)
        _, ok_p = pack_and_validate_rows(u32, lengths, pad_valid=True)
        assert np.asarray(ok_m).all()          # masked path: all valid
        ragged = lengths < 32
        assert (np.asarray(ok_p) == ~ragged).all()

    def test_builders_satisfy_contract(self):
        """Every in-repo matrix builder pads with PAD_BYTE, so its output
        passes pad_valid validation bit-for-bit."""
        import numpy as np

        from shortseq_tpu.batch import _ascii_matrix
        from shortseq_tpu.constants import PAD_BYTE
        from shortseq_tpu.ops.bitpack import pack_and_validate_rows

        seqs = ["ACGT" * k for k in (1, 3, 7, 8)] + ["", "A", "G" * 31]
        mat, lengths = _ascii_matrix(seqs, width=32)
        col = np.arange(32)[None, :]
        assert (mat[col >= lengths[:, None]] == PAD_BYTE).all()
        _, ok = pack_and_validate_rows(
            np.ascontiguousarray(mat).view(np.uint32), lengths,
            pad_valid=True)
        assert np.asarray(ok).all()
