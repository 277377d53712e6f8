"""All-256-byte differential validation sweep (round-1 VERDICT item 4).

The reference validates with a 64-bit bloom filter (util.pxd:88-127,
constant 0xFFFFFFFFFFEFFF75): byte c passes iff bit (c & 63) is clear,
i.e. (c & 63) in {1, 3, 7, 20}.  That accepts exactly uppercase A/C/G/T
among printable ASCII but also false-passes the aliased bytes
{0x01, 0x03, 0x07, 0x14} + 0x40/0x80/0xC0 offsets, which then encode via
(c >> 1) & 3 like their printable aliases.  Round 1 left the device path
stricter (exact ACGT), so ShortSeqCounter([b"\\x07ACG"]) and the device
ingest disagreed on identical input; these tests pin all three paths -
python oracle, native extension, device validate - to the same semantics
for every byte value.
"""

import numpy as np
import pytest

from shortseq_tpu import oracle
from shortseq_tpu.constants import BLOOM
from shortseq_tpu.native_build import load as _load_native
from shortseq_tpu.ops.bitpack import (first_bad_byte, pack_words, validate,
                                      validate_u32)

nat = _load_native()

BLOOM_PASS = {c for c in range(256) if not (BLOOM >> (c & 63)) & 1}


def test_bloom_pass_set_is_the_reference_alias_set():
    # {1,3,7,20} in each 64-aligned quarter of byte space.
    assert BLOOM_PASS == {b + off for b in (1, 3, 7, 20)
                          for off in (0, 64, 128, 192)}
    assert {ord(c) for c in "ACGT"} <= BLOOM_PASS
    for c in b"acgtNUn*\n @+":
        assert c not in BLOOM_PASS


def test_oracle_vs_device_all_256_bytes():
    # One row per byte value: "A<c>GT"
    mat = np.zeros((256, 16), np.uint8)
    mat[:, 0] = ord("A")
    mat[:, 1] = np.arange(256)
    mat[:, 2] = ord("G")
    mat[:, 3] = ord("T")
    lengths = np.full(256, 4, np.int32)
    ok_dev = np.asarray(validate(mat, lengths))
    ok_dev_u32 = np.asarray(
        validate_u32(np.ascontiguousarray(mat).view(np.uint32), lengths))
    np.testing.assert_array_equal(ok_dev, ok_dev_u32)
    for c in range(256):
        expect = c in BLOOM_PASS
        assert bool(ok_dev[c]) == expect, c
        assert oracle.is_base(c) == expect, c
        # The scalar oracle encoder agrees outcome-for-outcome.
        try:
            blocks = oracle.encode_bytes(bytes([65, c, 71, 84]))
            assert expect, c
            # Aliased bytes encode like their printable alias: (c >> 1) & 3.
            assert (blocks[0] >> 2) & 3 == (c >> 1) & 3
        except Exception:
            assert not expect, c


@pytest.mark.skipif(nat is None, reason="native ext unavailable")
def test_native_vs_oracle_all_256_bytes():
    for c in range(256):
        seq = bytes([65, c, 71, 84])
        try:
            blocks = oracle.encode_bytes(seq)
            scalar = ("ok", blocks)
        except Exception:
            scalar = ("err",)
        try:
            obj = nat.from_bytes(seq)
            native = ("ok", [hash(obj) & ((1 << 64) - 1)])
        except Exception:
            native = ("err",)
        assert scalar[0] == native[0], c
        if scalar[0] == "ok":
            assert scalar[1] == native[1], c


def test_device_packs_aliases_like_the_scalar_paths():
    # The VERDICT demo: b"\x07ACG" must give the same outcome everywhere.
    seq = b"\x07ACG"
    blocks = oracle.encode_bytes(seq)
    assert oracle.decode_blocks(blocks, 4) == "GACG"
    mat = np.zeros((1, 16), np.uint8)
    mat[0, :4] = np.frombuffer(seq, np.uint8)
    lengths = np.array([4], np.int32)
    assert bool(np.asarray(validate(mat, lengths))[0])
    words = np.asarray(pack_words(mat))
    assert int(words[0, 0]) == blocks[0]

    from shortseq_tpu.api.counter import ShortSeqCounter, count_matrix_device

    by_objects = ShortSeqCounter([seq])
    by_device = count_matrix_device(mat, lengths)
    assert by_objects == by_device
    assert [str(k) for k in by_device] == ["GACG"]


def test_first_bad_byte_uses_bloom_semantics():
    mat = np.zeros((3, 16), np.uint8)
    rows = [b"AC\x07T", b"ACG\x02", b"acgt"]
    lengths = np.array([4, 4, 4], np.int32)
    for i, r in enumerate(rows):
        mat[i, :4] = np.frombuffer(r, np.uint8)
    idx = np.asarray(first_bad_byte(mat, lengths))
    # \x07 is bloom-valid; \x02 and lowercase are not.
    assert list(idx) == [16, 3, 0]


def test_batched_paths_raise_same_error_as_scalar():
    from shortseq_tpu import pack_batch

    for bad_seq in (b"ACNT", b"acgt", b"AC\x02T"):
        try:
            oracle.encode_bytes(bad_seq)
            raise AssertionError("oracle accepted an invalid input")
        except Exception as e:
            scalar_msg = str(e)
        with pytest.raises(Exception, match="Unsupported base character"):
            pack_batch([bad_seq])
        try:
            pack_batch([bad_seq])
        except Exception as e:
            assert str(e) == scalar_msg
