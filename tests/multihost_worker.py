"""Worker for test_multihost.py: one of N jax.distributed CPU processes
driving the multi-host dedup entry point end-to-end.

Usage: multihost_worker.py <process_id> <num_processes> <port> <fastq> <out.json>

Each process initializes the distributed runtime (gloo-backed CPU
collectives), runs read_and_count_fastq_distributed, and dumps the
replicated merged table as {seq: count} JSON so the parent test can check
bit-exact parity against collections.Counter and cross-process agreement.
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    pid, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    fastq, out_path = sys.argv[4], sys.argv[5]

    from shortseq_tpu.dist.mesh import initialize_distributed

    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n_procs, process_id=pid)

    import jax

    assert jax.process_count() == n_procs, jax.process_count()

    from shortseq_tpu.dist.pipeline import (read_and_count_fastq_distributed,
                                            table_to_host_rows)
    from shortseq_tpu.oracle import decode_blocks

    # More shards than hosts exercises the round-robin shard loop; the
    # merged table is mesh-SHARDED (bucketed production merge,
    # layout="scattered"), so materialization exercises the
    # multi-controller addressable-shards + process_allgather path.
    def _agg(table):
        out = {}
        for (length, blocks), count in table_to_host_rows(table):
            seq = decode_blocks(blocks, length)
            out[seq] = out.get(seq, 0) + count
        return out

    table = read_and_count_fastq_distributed(fastq, n_shards=2 * n_procs + 1)
    assert table.layout == "scattered", table.layout
    result = _agg(table)
    n_u = table.n_unique
    assert len(result) == int(n_u), (len(result), int(n_u))

    # Lazy distributed reads, cross-process: every collective returns a
    # replicated answer, so all processes agree without host exchange
    # (most_common/total/lookups), and values() exercises the
    # host-allgather multiset path.
    from shortseq_tpu.dist import data_mesh, distributed_count_table

    t = distributed_count_table(table, data_mesh())
    assert len(t) == len(result)
    assert t.total() == sum(result.values())
    assert sorted(t.values().tolist()) == sorted(result.values())
    top = t.most_common(5)
    for k, c in top:
        assert result[str(k)] == c
    some = list(result)[:10]
    for s in some:
        assert t[s] == result[s]

    # Full-production rehearsal (VERDICT r04 next-step 5): the SAME
    # distributed pipeline with per-shard checkpoint spill, then a resume
    # pass in-process - every shard must be loaded from disk (no
    # recount), both passes must reproduce the live table, and the lazy
    # distributed reads above already ran against the same mesh in this
    # very process, so checkpointing + dist tables + (below) mesh UMI all
    # share one jax.distributed runtime.
    import os

    from shortseq_tpu.config import PipelineConfig
    from shortseq_tpu.count.checkpoint import completed_shards

    n_shards = 2 * n_procs + 1
    ckpt_dir = out_path + ".ckpt"  # same filesystem for all processes
    cfg = PipelineConfig(checkpoint_dir=ckpt_dir)
    t_ck = read_and_count_fastq_distributed(fastq, n_shards=n_shards,
                                            config=cfg)
    assert _agg(t_ck) == result
    mine = set(range(pid, n_shards, n_procs))
    assert completed_shards(ckpt_dir, pid) >= mine, \
        (completed_shards(ckpt_dir, pid), mine)
    # Resume: all shards complete -> the second pass only loads + merges.
    t_rs = read_and_count_fastq_distributed(fastq, n_shards=n_shards,
                                            config=cfg)
    assert _agg(t_rs) == result

    # Multi-host UMI dedup (BASELINE config 5): the sharded adjacency runs
    # over the same global mesh across these real process boundaries and
    # must match the single-device collapse bit-for-bit.
    import numpy as np

    from shortseq_tpu.umi.dedup import dedup_umis

    rng = np.random.default_rng(99)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    pool = alpha[rng.integers(0, 4, size=(64, 10))]
    umis = [pool[i].tobytes() for i in rng.integers(0, 64, size=600)]
    l_single, r_single = dedup_umis(umis, threshold=1, method="directional")
    l_mesh, r_mesh = dedup_umis(umis, threshold=1, method="directional",
                                mesh=data_mesh())
    assert (l_single == l_mesh).all() and r_single == r_mesh

    # A REVERSED device order breaks any rank-order reassembly assumption:
    # gather_row_sharded must still return rows in global order.
    import jax
    from jax.sharding import Mesh

    rev = Mesh(np.asarray(list(jax.devices())[::-1]), axis_names=("data",))
    l_rev, r_rev = dedup_umis(umis, threshold=1, method="directional",
                              mesh=rev)
    assert (l_single == l_rev).all() and r_single == r_rev

    # Forced bucketed-overflow fallback ACROSS PROCESS BOUNDARIES
    # (VERDICT r03 next-step 8): count_sharded_auto's host-side branch on
    # the replicated overflow flag must agree on every controller - a
    # disagreeing process would issue mismatched collectives and
    # hang/crash the gloo run.  Adversarially skewed keys (all hashing to
    # one bucket) must flip every process to the exact all_gather
    # fallback; benign keys must keep the scattered fast path.
    skew_layout, benign_layout = _skew_overflow_multihost()

    with open(out_path, "w") as f:
        json.dump({"table": result, "skew_layout": skew_layout,
                   "benign_layout": benign_layout}, f, sort_keys=True)


def _skew_overflow_multihost():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shortseq_tpu.count import count_batch
    from shortseq_tpu.count.device import counts_to_host
    from shortseq_tpu.dist import (count_sharded_auto, data_mesh,
                                   table_to_host_rows)
    from shortseq_tpu.dist.count import _bucket_hash

    d = jax.device_count()
    mesh = data_mesh()
    n = 504  # divisible by every mesh size the parent test uses
    lengths_val = 20

    # Deterministic generation -> every process builds the SAME global
    # input and supplies its own slice via process-local device_put.
    rng = np.random.default_rng(5)
    skewed = []
    while len(skewed) < n:
        cand = rng.integers(0, 2**32, size=(8192, 2),
                            dtype=np.uint64).astype(np.uint32)
        b = np.asarray(_bucket_hash(
            jnp.asarray(cand), jnp.full(8192, lengths_val, jnp.int32), d))
        skewed.extend(map(tuple, cand[b == 0]))
    skewed = np.asarray(sorted(set(skewed))[:n], np.uint32)
    assert len(skewed) == n
    # Half the rows duplicate the first half's keys, so the overflow path
    # also exercises weight accumulation across duplicate keys (ADVICE
    # r04: the previous concat truncated back to all-unique rows).
    words = np.concatenate([skewed[: n - n // 2], skewed[: n // 2]])
    lengths = np.full(n, lengths_val, np.int32)
    weights = np.ones(n, np.int32)
    benign = rng.integers(0, 2**32, size=(n, 2),
                          dtype=np.uint64).astype(np.uint32)

    sh_rows = NamedSharding(mesh, P("data"))
    sh_flat = NamedSharding(mesh, P("data"))

    def globalize(x):
        sh = sh_rows if x.ndim == 2 else sh_flat
        per = n // jax.process_count()
        lo = jax.process_index() * per
        return jax.make_array_from_process_local_data(sh, x[lo:lo + per])

    auto = count_sharded_auto(mesh)
    table = auto(globalize(words), globalize(lengths), globalize(weights))
    assert table.layout == "prefix", table.layout  # fallback taken
    # Exactness vs a single-device local count of the full input.
    local = dict(counts_to_host(*count_batch(jnp.asarray(words),
                                             jnp.asarray(lengths))))
    got = dict(table_to_host_rows(table))
    assert got == local, (len(got), len(local))

    table_b = auto(globalize(benign), globalize(lengths),
                   globalize(weights))
    assert table_b.layout == "scattered", table_b.layout
    local_b = dict(counts_to_host(*count_batch(jnp.asarray(benign),
                                               jnp.asarray(lengths))))
    got_b = dict(table_to_host_rows(table_b))
    assert got_b == local_b
    return table.layout, table_b.layout


if __name__ == "__main__":
    main()
