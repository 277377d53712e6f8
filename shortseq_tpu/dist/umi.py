"""Sharded UMI adjacency: the O(U^2) pairwise neighbour search is the
only super-linear stage of UMI clustering, and it is embarrassingly
data-parallel over ROW BLOCKS.  Each device takes a contiguous band of
rows, computes its [U/D, U] distance band against the replicated key
table, and reduces it on device to per-row neighbour indices
(umi/dedup._extract_ascending); only [U/D, k] int32 indices per device
ever leave the chip.  Graph collapse stays on the host - it is O(edges),
not O(U^2).

The reference has no UMI clustering at all (its umi subpackage is alpha,
reference umi/README.md:1); this is the scale-out form of the capability
umi/dedup.py finishes.
"""

from __future__ import annotations

_STEP_CACHE = {}


def neighbors_sharded_step(mesh, threshold: int, k: int, block: int):
    """Jitted shard_map: (words [U, W], lengths [U], gids [U] replicated;
    row ids [U] sharded over 'data') -> (idx [U, k], cnt [U]) sharded over
    rows.  U must be divisible by mesh_size * block."""
    key = (mesh, threshold, k, block)
    step = _STEP_CACHE.get(key)
    if step is not None:
        return step

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..umi.dedup import _adjacency_score, _extract_ascending

    def body(words, lengths, gids, row_ids):
        nloc = row_ids.shape[0]
        nb = nloc // block

        def blk(i):
            ids = jax.lax.dynamic_slice_in_dim(row_ids, i * block, block, 0)
            aw = jnp.take(words, ids, axis=0)
            al = jnp.take(lengths, ids, axis=0)
            ag = jnp.take(gids, ids, axis=0)
            score, cnt = _adjacency_score(aw, al, ag, ids, words, lengths,
                                          gids, threshold)
            return _extract_ascending(score, k), cnt

        idx, cnt = jax.lax.map(blk, jnp.arange(nb, dtype=jnp.int32))
        return idx.reshape(nloc, k), cnt.reshape(nloc)

    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    step = jax.jit(mapped)
    _STEP_CACHE[key] = step
    return step
