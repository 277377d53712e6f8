"""Batched hamming distance over packed uint32 lanes.

Reference semantics (short_seq_64.pyx:77-84, short_seq_192.pyx:74-91,
short_seq_var.pyx:64-81): per 64-bit block, c = a ^ b;
c = ((c >> 1) | c) & 0x5555...; popcount; summed over blocks.  Complementary
codes XOR to 0b11 and must count once, hence the collapse.

On TPU the same math runs on uint32 lanes with
jax.lax.population_count - the collapse never crosses a 2-bit field, so
splitting each block into two lanes is bit-exact.  Lanes past a read's
length are zero in both operands (the pack path zero-fills), so no masking
is needed when lengths match - and the API requires equal lengths, as the
reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bitpack import collapse_xor


@jax.jit
def hamming_rows(a_words: jax.Array, b_words: jax.Array) -> jax.Array:
    """Row-wise hamming: `[N, W] x [N, W] -> [N]` int32."""
    c = collapse_xor(a_words ^ b_words)
    return jnp.sum(jax.lax.population_count(c), axis=-1).astype(jnp.int32)


@jax.jit
def hamming_pairwise(a_words: jax.Array, b_words: jax.Array) -> jax.Array:
    """All-pairs hamming: `[N, W] x [M, W] -> [N, M]` int32.

    The batched building block for UMI clustering (SURVEY section 2 row 15).
    Broadcasts the XOR; fine up to a few thousand rows per tile - larger
    problems should tile via ops.pallas_kernels.hamming_pairwise_tiled.
    """
    c = collapse_xor(a_words[:, None, :] ^ b_words[None, :, :])
    return jnp.sum(jax.lax.population_count(c), axis=-1).astype(jnp.int32)
