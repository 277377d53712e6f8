"""Sanity tests for the pure-Python oracle itself (frozen golden vectors)."""

import pytest

from shortseq_tpu import oracle


def test_golden_atgc():
    # A,T,G,C -> 0,2,3,1 LSB-first: 0b01_11_10_00 = 0x78
    assert oracle.encode_bytes(b"ATGC") == [0x78]
    assert oracle.decode_blocks([0x78], 4) == "ATGC"


def test_golden_boundaries():
    # 32 G's: all ones
    assert oracle.encode_bytes(b"G" * 32) == [(1 << 64) - 1]
    # 33 A's: two blocks, all zero
    assert oracle.encode_bytes(b"A" * 33) == [0, 0]
    # C at position 32 -> block 1 low bits = 01
    assert oracle.encode_bytes(b"A" * 32 + b"C") == [0, 1]


def test_rejects():
    for bad in (b"N", b"ACGU", b"acgt", b"AC*T"):
        with pytest.raises(Exception, match="Unsupported base character"):
            oracle.encode_bytes(bad)


def test_bloom_false_pass_quirk():
    # The reference's bloom filter false-passes control byte 0x01 (bit 1 of
    # the constant is clear) and then encodes garbage for it.  The oracle is
    # bit-exact with that acceptance; the device path (ops.validate) rejects
    # such bytes instead - a documented, strictly-safer divergence.
    oracle.encode_bytes(b"\x01")  # does not raise, matching the reference


def test_hamming_collapse():
    # A (00) vs G (11): XOR = 0b11, must count as ONE difference
    a = oracle.encode_bytes(b"A")
    g = oracle.encode_bytes(b"G")
    assert oracle.hamming_blocks(a, g, 1) == 1


def test_slice_blocks_cross_boundary():
    seq = b"ACGT" * 20  # 80 nt, 3 blocks
    blocks = oracle.encode_bytes(seq)
    for start in (0, 1, 15, 16, 31, 32, 33, 47):
        for ln in (1, 16, 17, 32, 33):
            if start + ln > len(seq):
                continue
            piece = oracle.slice_blocks(blocks, start, ln)
            assert oracle.decode_blocks(piece, ln) == seq[start:start + ln].decode()


def test_lane_roundtrip():
    blocks = oracle.encode_bytes(b"TATTAGCGATTGACAGTTGTCCTGTAATAACGCCGGGTAAATTTGCCG")
    lanes = oracle.blocks_to_lanes(blocks, 4)
    assert oracle.lanes_to_blocks(lanes, 2) == blocks
