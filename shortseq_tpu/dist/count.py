"""Sharded dedup: per-shard sort-unique count + collective merge.

The TPU-native replacement for the reference's single hash table
(reference counter.pyx:41-54).  Each device counts its shard locally
(dense sort-unique, count/device.py), then the shards' padded count tables
are `all_gather`ed over the `data` axis and reduced with one more
unique_count - exact because counting is associative.  The gather moves
only the deduplicated tables (typically << reads), and rides ICI within a
slice.

All shapes are static: a shard of N reads yields a table padded to N rows;
the merged table is padded to N * n_devices rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..count.device import unique_count
from ..ops.bitpack import pack_words, validate


def _local_count_and_merge(words, lengths, weights):
    """shard_map body: local unique -> all_gather tables -> re-unique."""
    u_words, u_lengths, u_counts, _ = unique_count(words, lengths, weights)
    g_words = jax.lax.all_gather(u_words, "data", tiled=True)
    g_lengths = jax.lax.all_gather(u_lengths, "data", tiled=True)
    g_counts = jax.lax.all_gather(u_counts, "data", tiled=True)
    return unique_count(g_words, g_lengths, g_counts)


def count_sharded(mesh: Mesh):
    """Build a jitted sharded counter: `[N, W]`/`[N]` (N divisible by mesh
    size) -> replicated (u_words, u_lengths, u_counts, n_unique)."""
    mapped = shard_map(
        _local_count_and_merge,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_counter(mesh: Mesh):
    """Full device pipeline: ASCII read matrix -> packed words -> validity ->
    sharded count (the distributed form of reference counter.pyx:57-71's
    pipeline).  Returns a jitted fn of (ascii_u8 [N, L], lengths [N]).

    The returned n_unique is exact; the validity mask is returned so the
    host can raise the reference's "Unsupported base character" error.
    """

    def step(ascii_u8, lengths):
        def shard_body(a, l):
            words = pack_words(a)
            ok = validate(a, l)
            u_w, u_l, u_c, _ = unique_count(
                words, l, jnp.ones(a.shape[0], jnp.int32))
            g_w = jax.lax.all_gather(u_w, "data", tiled=True)
            g_l = jax.lax.all_gather(u_l, "data", tiled=True)
            g_c = jax.lax.all_gather(u_c, "data", tiled=True)
            merged = unique_count(g_w, g_l, g_c)
            all_ok = jax.lax.all_gather(ok, "data", tiled=True)
            return merged + (all_ok,)

        mapped = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )
        return mapped(ascii_u8, lengths)

    return jax.jit(step)
