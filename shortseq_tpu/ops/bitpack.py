"""Batched 2-bit pack / unpack / validate as jnp ops (XLA compute path).

Design (TPU-first, not a translation of the reference's BMI2 pext tricks):

* Unit of work is a batch `[N, L]` of ASCII bytes, padded with 0 to a static
  L that is a multiple of 16 nts.  Output is `[N, L // 16]` uint32 lanes,
  nucleotide i of a row in lane i // 16 at bits 2 * (i % 16) - the exact
  little-endian split of the reference's LSB-first uint64 blocks
  (reference util.pyx:100-140).

* The device-native input layout is `[N, L // 4]` uint32 - the same bytes
  the host already holds, viewed 4 chars per lane (numpy `.view(uint32)`,
  zero copy).  8-bit arrays on TPU live in a packed tiled layout, and every
  u8<->u32 bitcast is a cross-lane relayout pass; taking the input as u32
  eliminates the largest one (round-1 VERDICT: the u8 path reached ~3% of
  HBM bandwidth, and the relayouts were the suspect).

* The encode is pure lane arithmetic: code = (ascii >> 1) & 3, which equals
  the reference's table_91 lookup / pext-mask trick for every byte the
  bloom filter accepts.  16 codes per output lane are assembled in two
  steps:
    1. within-lane SWAR: 4 codes at bits {0,8,16,24} compact into the low
       byte ((c | c>>6 | c>>12 | c>>18) & 0xFF) - elementwise VPU work;
    2. 4:1 cross-lane combine out = b0 | b1<<8 | b2<<16 | b3<<24.  This is
       a *linear* function of the lanes, so it runs on the MXU as two bf16
       matmuls against constant banded {1, 256} matrices (exact: every
       product is an 8-bit integer times a power of two, accumulated in
       f32, results <= 65535 < 2^24), then lo | hi << 16.  No relayouts,
       no gathers; XLA fuses step 1 into the dot operand read.

* Validation is a mask, not an exception (SURVEY.md section 7 decision 3),
  and implements the reference's EXACT 64-bit bloom semantics
  (util.pxd:88-127, constant 0xFFFFFFFFFFEFFF75): byte c passes iff
  (c & 63) is one of {1, 3, 7, 20}.  That accepts exactly uppercase
  A/C/G/T among printable ASCII, and also the reference's false-pass
  aliases (0x01, 0x03, 0x07, 0x14, 0x41|0x80, ...) which then encode via
  (c >> 1) & 3 exactly as the reference's table does - so the scalar
  object layer (oracle.is_base, csrc encode_into) and this device path
  agree on all 256 byte values (round-1 VERDICT item 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Low 32 bits of ~BLOOM: the pass-set {1, 3, 7, 20} of (byte & 63).  The
# high 32 bits of the reference bloom are all ones, so (c & 32) != 0 is
# always invalid (constants.BLOOM = 0xFFFFFFFFFFEFFF75).
_BLOOM_PASS_LO = 0x0010008A


def _u8_to_u32(x: jax.Array) -> jax.Array:
    """[N, 4k] uint8 -> [N, k] uint32, little-endian within each group of 4."""
    n, l = x.shape
    return jax.lax.bitcast_convert_type(x.reshape(n, l // 4, 4), jnp.uint32)


def _u32_to_u8(x: jax.Array) -> jax.Array:
    """[N, k] uint32 -> [N, 4k] uint8, little-endian."""
    n, k = x.shape
    return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(n, 4 * k)


def _codes_byte(x_u32: jax.Array) -> jax.Array:
    """u32 lane of 4 ASCII chars -> u32 lane with their 4 2-bit codes in
    the low byte (LSB-first)."""
    c = (x_u32 >> 1) & jnp.uint32(0x03030303)
    return (c | (c >> 6) | (c >> 12) | (c >> 18)) & jnp.uint32(0xFF)


@functools.lru_cache(maxsize=None)
def _compact_mats(w4: int):
    """Constant banded matrices for the 4:1 lane combine as matmuls:
    out16lo[:, j] = b[:, 4j] + 256 * b[:, 4j+1], out16hi likewise from
    lanes 4j+2, 4j+3."""
    w = w4 // 4
    p_lo = np.zeros((w4, w), np.float32)
    p_hi = np.zeros((w4, w), np.float32)
    for j in range(w):
        p_lo[4 * j + 0, j] = 1.0
        p_lo[4 * j + 1, j] = 256.0
        p_hi[4 * j + 2, j] = 1.0
        p_hi[4 * j + 3, j] = 256.0
    return p_lo, p_hi


def pack_words_u32(x_u32: jax.Array) -> jax.Array:
    """Pack `[N, W4]` uint32 (4 ASCII chars per lane, W4 % 4 == 0, zero
    padded) to `[N, W4 // 4]` uint32 packed lanes.

    Padding bytes (0) encode to code 0, matching the reference's
    zero-filled tail blocks (util.pyx:94, calloc in short_seq_var.pyx:126).
    """
    n, w4 = x_u32.shape
    b = _codes_byte(x_u32).astype(jnp.bfloat16)     # exact: values 0..255
    p_lo, p_hi = _compact_mats(w4)
    dn = (((1,), (0,)), ((), ()))
    lo = jax.lax.dot_general(b, jnp.asarray(p_lo, jnp.bfloat16), dn,
                             preferred_element_type=jnp.float32)
    hi = jax.lax.dot_general(b, jnp.asarray(p_hi, jnp.bfloat16), dn,
                             preferred_element_type=jnp.float32)
    return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)


def pack_words(ascii_u8: jax.Array) -> jax.Array:
    """Pack `[N, L]` ASCII uint8 (L % 16 == 0, zero padded) to
    `[N, L//16]` uint32.  Compatibility wrapper: prefer handing the device
    the uint32 view directly (host `.view(uint32)` is free; the u8->u32
    bitcast here is a relayout pass on device)."""
    return pack_words_u32(_u8_to_u32(ascii_u8))


def unpack_ascii(words: jax.Array, out_len: int | None = None) -> jax.Array:
    """Inverse of pack_words: `[N, W]` uint32 -> `[N, W*16]` ASCII uint8.

    Codes decode through the reference charmap A,C,T,G (util.pyx:52); bases
    past a row's true length decode to 'A' (code 0) and must be sliced off
    by the caller.
    """
    b8 = _u32_to_u8(words)                         # [N, 4W], 4 codes per byte
    z = b8.astype(jnp.uint32)
    spread = (z | (z << 6) | (z << 12) | (z << 18)) & jnp.uint32(0x03030303)
    codes = _u32_to_u8(spread)                     # [N, 16W] one code per byte
    # code -> ascii: 0->A(65) 1->C(67) 2->T(84) 3->G(71)
    ascii_out = jnp.where(
        codes == 0, jnp.uint8(65),
        jnp.where(codes == 1, jnp.uint8(67),
                  jnp.where(codes == 2, jnp.uint8(84), jnp.uint8(71))))
    if out_len is not None:
        ascii_out = ascii_out[:, :out_len]
    return ascii_out


def _byte_ok(c: jax.Array) -> jax.Array:
    """Reference bloom test on u32 lanes holding one byte value each:
    pass iff bit (c & 63) of ~BLOOM is set, i.e. (c & 32) == 0 and bit
    (c & 31) of _BLOOM_PASS_LO is set (util.pxd:98-99)."""
    hit = (jnp.uint32(_BLOOM_PASS_LO) >> (c & jnp.uint32(31))) & jnp.uint32(1)
    return (hit == 1) & ((c & jnp.uint32(32)) == 0)


def _invalid_mask_u32(x_u32: jax.Array, lengths: jax.Array):
    """Per-byte bloom validity over the u32-viewed ASCII matrix.  Yields
    (positions `[N, W4, 4]`-ish as per-k pairs) lazily per byte slot to
    keep everything fused elementwise."""
    n, w4 = x_u32.shape
    lane_pos = jax.lax.broadcasted_iota(jnp.int32, (n, w4), 1)
    for k in range(4):
        c = (x_u32 >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
        pos = 4 * lane_pos + k
        bad = ~_byte_ok(c) & (pos < lengths[:, None])
        yield pos, bad


def validate_u32(x_u32: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-row validity mask: True iff every byte before the row's length
    passes the reference bloom filter.

    SWAR formulation: all 4 bytes of a lane are tested at once with exact
    per-byte zero tests against the 4 pass values - no per-byte variable
    shifts, so XLA fuses this into the same input read as the pack
    (measured ~800 G nt/s standalone on v5e vs ~460 for the shift
    formulation; benchmarks/pack_variants.py)."""
    m = x_u32 & jnp.uint32(0x3F3F3F3F)            # (c & 63) per byte

    def eqz(y):
        # Exact per-byte zero test: bit 7 of each byte set iff the byte is
        # zero.  (y & 0x7F) + 0x7F sets bit 7 iff the low 7 bits are
        # nonzero; | y catches bit 7 itself; no cross-byte carries.
        return ~(((y & jnp.uint32(0x7F7F7F7F)) + jnp.uint32(0x7F7F7F7F))
                 | y) & jnp.uint32(0x80808080)

    ok_b = (eqz(m ^ jnp.uint32(0x01010101))        # 'A' & 63
            | eqz(m ^ jnp.uint32(0x03030303))      # 'C' & 63
            | eqz(m ^ jnp.uint32(0x07070707))      # 'G' & 63
            | eqz(m ^ jnp.uint32(0x14141414)))     # 'T' & 63
    n, w4 = x_u32.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, w4), 1)
    rem = jnp.clip(lengths[:, None] - 4 * lane, 0, 4)  # bytes in range
    mask = jnp.where(
        rem >= 4, jnp.uint32(0x80808080),
        jnp.where(rem == 3, jnp.uint32(0x00808080),
                  jnp.where(rem == 2, jnp.uint32(0x00008080),
                            jnp.where(rem == 1, jnp.uint32(0x00000080),
                                      jnp.uint32(0)))))
    bad = (~ok_b) & mask
    return ~jnp.any(bad != 0, axis=1)


def first_bad_byte_u32(x_u32: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-row index of the first bloom-failing byte (or 4*W4 if none).
    Lets the host raise the reference's exact per-character message
    (short_seq_64.pyx:105) from batched validation."""
    n, w4 = x_u32.shape
    big = jnp.int32(4 * w4)
    first = jnp.full((n,), big, jnp.int32)
    for pos, bad in _invalid_mask_u32(x_u32, lengths):
        first = jnp.minimum(first, jnp.min(jnp.where(bad, pos, big), axis=1))
    return first


def validate(ascii_u8: jax.Array, lengths: jax.Array) -> jax.Array:
    """u8-matrix wrapper over validate_u32."""
    return validate_u32(_u8_to_u32(ascii_u8), lengths)


def first_bad_byte(ascii_u8: jax.Array, lengths: jax.Array) -> jax.Array:
    """u8-matrix wrapper over first_bad_byte_u32."""
    return first_bad_byte_u32(_u8_to_u32(ascii_u8), lengths)


def collapse_xor(c: jax.Array) -> jax.Array:
    """((c >> 1) | c) & 0x5555... on uint32 lanes.  The 2-bit fields never
    straddle a lane boundary, so the per-uint32 collapse is bit-identical to
    the reference's per-uint64 collapse (short_seq_64.pyx:83)."""
    return ((c >> 1) | c) & jnp.uint32(0x55555555)


@jax.jit
def pack_and_validate_u32(x_u32: jax.Array, lengths: jax.Array):
    """Fused pack + validity mask on the u32-viewed byte matrix (the hot
    construction path, SURVEY 3.1).  XLA fuses the codes/validity
    elementwise work into one read of the input feeding the compaction
    matmuls."""
    return pack_words_u32(x_u32), validate_u32(x_u32, lengths)


@jax.jit
def pack_and_validate(ascii_u8: jax.Array, lengths: jax.Array):
    """Fused pack + validity mask from a u8 matrix (compatibility path;
    pays one u8->u32 relayout that pack_and_validate_u32 avoids)."""
    x = _u8_to_u32(ascii_u8)
    return pack_words_u32(x), validate_u32(x, lengths)
