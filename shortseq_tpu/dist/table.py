"""Lazy reads over a mesh-SHARDED count table.

count.table.CountTable gives single-device tables Counter-style reads
without materialization; this is the same contract for the production
distributed merge's output (count_sharded_auto, layout="scattered":
device d holds hash-bucket d's uniques, rows PAD-interleaved).  Without
it, a multi-host `top 20` would pull the ENTIRE sharded table to every
host (table_to_host_rows) just to discard all but 20 rows.

All reads run as collectives over the mesh and return replicated
results, so every process computes the same answer with no host-side
exchange:

  len(t)           replicated n_unique scalar (already computed)
  t.total()        one replicated sum (padding counts are 0), int32-wrap
                   poisoned like unique_count
  t.most_common(n) per-shard lax.top_k -> all_gather of D*k candidate
                   rows -> host merge of k*D rows, never the table
  key in t / t[k]  per-shard comparison scan -> psum -> one scalar
  t.values()       per-process addressable counts + host allgather
  t.to_counter()   full materialization via dist.pipeline.table_to_counter

Prefix-layout tables (the overflow fallback's replicated output) don't
need any of this - distributed_count_table() routes them to the plain
CountTable, whose device ops run replicated.
"""

from __future__ import annotations

import numpy as np


def distributed_count_table(table, mesh):
    """The right lazy view for a merged table: plain CountTable for
    replicated prefix layouts, DistributedCountTable for mesh-sharded
    scattered layouts."""
    from ..count.table import CountTable
    from .count import ShardedCountTable

    if not isinstance(table, ShardedCountTable) or table.layout == "prefix":
        return CountTable.from_device_tables([tuple(table[:4])])
    return DistributedCountTable(table, mesh)


class DistributedCountTable:
    def __init__(self, table, mesh):
        from .count import ShardedCountTable

        if not (isinstance(table, ShardedCountTable)
                and table.layout == "scattered"):
            raise ValueError("expected a scattered-layout ShardedCountTable")
        self._t = table
        self._mesh = mesh
        self._n = None
        self._steps = {}

    # -- cheap reads ----------------------------------------------------

    def __len__(self) -> int:
        import jax

        if self._n is None:
            self._n = int(jax.device_get(self._t.n_unique))
        return self._n

    def _jit(self, key, build):
        if key not in self._steps:
            self._steps[key] = build()
        return self._steps[key]

    def total(self) -> int:
        import jax
        import jax.numpy as jnp

        def build():
            @jax.jit
            def run(counts):
                s = jnp.sum(counts)
                shadow = jnp.sum(counts.astype(jnp.float32))
                wrapped = (jnp.abs(shadow - s.astype(jnp.float32))
                           > jnp.float32(2**30))
                return jnp.where(wrapped | (jnp.min(counts) < 0),
                                 jnp.int32(-1), s)

            return run

        s = int(jax.device_get(self._jit("total", build)(self._t.counts)))
        if s < 0:
            raise OverflowError(
                "count table entry/total exceeded int32; merge in smaller "
                "pieces")
        return s

    def most_common(self, n: int | None = None):
        """Top-n (ShortSeq, count) pairs, count desc then key asc.  Only
        D*k candidate rows cross the mesh and the link (k = n rounded to
        a pow2 bucket); n=None falls back to full materialization order.
        Tie members at the boundary follow shard order (same freedom as
        CountTable.most_common documents)."""
        if n is None:
            from ..count.device import _rows_to_table
            from .pipeline import _table_to_host

            rows = _pairs(_rows_to_table(*_table_to_host(self._t)))
            rows.sort(key=lambda kv: (-kv[1], str(kv[0])))
            return rows
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        k = max(16, 1 << max(n - 1, 0).bit_length())
        k = max(1, min(k, self._t.counts.shape[0]
                       // self._mesh.devices.size))

        def build():
            def body(words, lengths, counts):
                # shard_map body: per-shard [rows/D(, W)] views
                v, idx = jax.lax.top_k(counts, k)
                return (jax.lax.all_gather(words[idx], "data", tiled=True),
                        jax.lax.all_gather(lengths[idx], "data", tiled=True),
                        jax.lax.all_gather(v, "data", tiled=True),
                        jax.lax.pmin(jnp.min(counts), "data"))

            mapped = shard_map(
                body, mesh=self._mesh,
                in_specs=(P("data"), P("data"), P("data")),
                out_specs=(P(), P(), P(), P()),
                check_vma=False)
            return jax.jit(mapped)

        w, lens, cnts, mn = jax.device_get(self._jit(("topk", k), build)(
            self._t.words, self._t.lengths, self._t.counts))
        if int(mn) < 0:
            raise OverflowError(
                "count table entry exceeded int32; merge in smaller pieces")
        w, lens, cnts = np.asarray(w), np.asarray(lens), np.asarray(cnts)
        keep = cnts > 0  # pad rows carry count 0
        rows = _pairs_from_arrays(w[keep], lens[keep], cnts[keep])
        rows.sort(key=lambda kv: (-kv[1], str(kv[0])))
        return rows[:n]

    def values(self):
        """All live counts as host numpy int64 (order unspecified);
        multi-controller processes exchange per-host slabs so every
        process returns the identical multiset."""
        from .pipeline import _scattered_to_host

        _, lens, cnts = _scattered_to_host(
            self._t.words, self._t.lengths, self._t.counts)
        cnts = np.asarray(cnts, np.int64)
        if cnts.size and int(cnts.min()) < 0:
            raise OverflowError(
                "count table entry exceeded int32; merge in smaller pieces")
        return cnts

    # -- lookups ----------------------------------------------------------

    def get(self, key, default=0):
        import jax
        import jax.numpy as jnp

        from ..count.table import _key_to_rows

        q = _key_to_rows(key)
        if q is None:
            return default
        q_len, lanes = q
        width = self._t.words.shape[1]
        if q_len > 16 * width or any(int(x) for x in lanes[width:]):
            return default
        q_words = np.zeros(width, np.uint32)
        q_words[:min(len(lanes), width)] = lanes[:width]

        def build():
            @jax.jit
            def run(words, lengths, counts, qw, ql):
                hit = (lengths == ql) & jnp.all(words == qw[None, :], axis=1)
                return jnp.sum(jnp.where(hit, counts, 0))

            return run

        c = int(jax.device_get(self._jit("lookup", build)(
            self._t.words, self._t.lengths, self._t.counts,
            jnp.asarray(q_words), jnp.int32(q_len))))
        if c < 0:
            raise OverflowError(
                "count table entry exceeded int32; merge in smaller pieces")
        return c if c else default

    def __contains__(self, key) -> bool:
        return self.get(key, None) is not None

    def __getitem__(self, key) -> int:
        c = self.get(key, None)
        if c is None:
            raise KeyError(key)
        return c

    # -- materialization --------------------------------------------------

    def to_counter(self):
        from .pipeline import table_to_counter

        return table_to_counter(self._t)


def _pairs(rows_to_table_out):
    from .. import api

    return [(api.from_blocks(blocks, length), count)
            for (length, blocks), count in rows_to_table_out]


def _pairs_from_arrays(w, lens, cnts):
    from ..count.device import _rows_to_table

    return _pairs(_rows_to_table(w, lens, cnts))
