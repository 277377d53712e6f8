"""Batched 2-bit pack / unpack / validate as jnp ops (XLA compute path).

Design (TPU-first, not a translation of the reference's BMI2 pext tricks):

* Unit of work is a batch `[N, L]` of ASCII bytes, padded with 0 to a static
  L that is a multiple of 16 nts.  Output is `[N, L // 16]` uint32 lanes,
  nucleotide i of a row in lane i // 16 at bits 2 * (i % 16) - the exact
  little-endian split of the reference's LSB-first uint64 blocks
  (reference util.pyx:100-140).

* The encode is pure lane arithmetic: code = (ascii >> 1) & 3, which equals
  the reference's table_91 lookup for every byte its bloom filter accepts
  among printable ASCII (A, C, G, T).  Packing 16 codes into a uint32 is done
  with two SWAR compactions glued by bitcasts, so the whole op is elementwise
  + reshapes: XLA fuses it into a single VPU pass, no gathers, no MXU.

  u32 view of 4 ascii bytes -> 4 codes at bits {0,8,16,24}
                            -> compact to 8 bits ((c | c>>6 | c>>12 | c>>18) & 0xFF)
     byte view glue         -> 4 compacted bytes -> one uint32 of 16 nts.

* Validation is a mask, not an exception (SURVEY.md section 7 decision 3):
  a byte is valid iff it is one of b"ACGT" or sits at/after the row's length
  (zero padding).  This matches the reference bloom filter on all printable
  ASCII; the control/extended bytes the reference's bloom false-passes (and
  then garbles) are rejected here.  Hosts raise the reference's
  "Unsupported base character" message from the mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



_U32 = jnp.uint32
_EVEN_BITS_32 = jnp.uint32(0x55555555)


def _u8_to_u32(x: jax.Array) -> jax.Array:
    """[N, 4k] uint8 -> [N, k] uint32, little-endian within each group of 4."""
    n, l = x.shape
    return jax.lax.bitcast_convert_type(x.reshape(n, l // 4, 4), jnp.uint32)


def _u32_to_u8(x: jax.Array) -> jax.Array:
    """[N, k] uint32 -> [N, 4k] uint8, little-endian."""
    n, k = x.shape
    return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(n, 4 * k)


def pack_words(ascii_u8: jax.Array) -> jax.Array:
    """Pack `[N, L]` ASCII (L % 16 == 0, zero padded) to `[N, L//16]` uint32.

    Padding bytes (0) encode to code 0, matching the reference's zero-filled
    tail blocks (util.pyx:94, calloc in short_seq_var.pyx:126).
    """
    x = _u8_to_u32(ascii_u8)                      # [N, L/4], 4 chars each
    c = (x >> 1) & jnp.uint32(0x03030303)          # 4 codes at bits 0,8,16,24
    b = (c | (c >> 6) | (c >> 12) | (c >> 18)) & jnp.uint32(0xFF)
    b8 = b.astype(jnp.uint8)                       # [N, L/4], 4 codes per byte
    return _u8_to_u32(b8)                          # [N, L/16], 16 nts per lane


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


def _invalid_mask(ascii_u8: jax.Array, lengths: jax.Array):
    """(positions, per-byte invalid mask): a byte is invalid iff it sits
    before its row's length and is not uppercase A/C/G/T (reference bloom
    semantics on printable ASCII, util.pxd:88-127)."""
    n, l = ascii_u8.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
    in_range = pos < lengths[:, None]
    x = ascii_u8
    is_acgt = (x == 65) | (x == 67) | (x == 71) | (x == 84)
    return pos, ~is_acgt & in_range


def validate(ascii_u8: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-row validity mask: True iff no byte before the row's length is
    invalid."""
    _, bad = _invalid_mask(ascii_u8, lengths)
    return ~jnp.any(bad, axis=1)


def first_bad_byte(ascii_u8: jax.Array, lengths: jax.Array):
    """For error reporting: per-row index of the first invalid byte (or L if
    none).  Lets the host raise the reference's exact per-character message
    (short_seq_64.pyx:105) from batched validation."""
    pos, bad = _invalid_mask(ascii_u8, lengths)
    return jnp.min(jnp.where(bad, pos, ascii_u8.shape[1]), axis=1)


def collapse_xor(c: jax.Array) -> jax.Array:
    """((c >> 1) | c) & 0x5555... on uint32 lanes.  The 2-bit fields never
    straddle a lane boundary, so the per-uint32 collapse is bit-identical to
    the reference's per-uint64 collapse (short_seq_64.pyx:83)."""
    return ((c >> 1) | c) & _EVEN_BITS_32


@jax.jit
def pack_and_validate(ascii_u8: jax.Array, lengths: jax.Array):
    """Fused pack + validity mask (the hot construction path, SURVEY 3.1)."""
    return pack_words(ascii_u8), validate(ascii_u8, lengths)
