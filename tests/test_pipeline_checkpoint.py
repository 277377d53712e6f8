"""Streaming sharded pipeline + checkpoint/resume (SURVEY.md sections 3.5
and 5): shard boundaries lose no records, resume skips completed shards,
and the merged table matches collections.Counter exactly."""

import collections

import numpy as np
import pytest

from tests.conftest import rand_sequence


def _write_fastq(path, reads):
    with open(path, "wb") as f:
        for i, r in enumerate(reads):
            f.write(f"@read{i} x\n{r}\n+\n{'J' * len(r)}\n".encode())


@pytest.fixture
def fastq(tmp_path, rng):
    reads = [rand_sequence(rng, rng.randint(5, 40)) for _ in range(300)]
    reads += reads[::3]
    path = tmp_path / "reads.fastq"
    _write_fastq(path, reads)
    return path, reads


def _as_dict(table):
    from shortseq_tpu.dist.pipeline import table_to_counter

    return {str(k): v for k, v in table_to_counter(table).items()}


class TestShardedPipeline:
    def test_single_shard_matches_counter(self, fastq):
        from shortseq_tpu.dist.pipeline import count_fastq_sharded

        path, reads = fastq
        table = count_fastq_sharded(path, n_shards=1)
        assert _as_dict(table) == dict(collections.Counter(reads))

    def test_multi_shard_no_loss_no_dup(self, fastq):
        from shortseq_tpu.io.native import get_lib
        from shortseq_tpu.dist.pipeline import count_fastq_sharded

        if get_lib() is None:
            pytest.skip("byte-range sharding needs the native sharder")
        path, reads = fastq
        table = count_fastq_sharded(path, n_shards=5)
        assert _as_dict(table) == dict(collections.Counter(reads))

    def test_multi_host_split_then_merge(self, fastq):
        from shortseq_tpu.io.native import get_lib
        from shortseq_tpu.dist.pipeline import (
            _merge_host_tuples_device, _table_to_host, count_fastq_sharded)

        if get_lib() is None:
            pytest.skip("byte-range sharding needs the native sharder")
        path, reads = fastq
        per_host = [
            count_fastq_sharded(path, n_shards=4, host=h, n_hosts=2)
            for h in range(2)
        ]
        merged = _merge_host_tuples_device(
            [_table_to_host(t) for t in per_host])
        assert _as_dict(merged) == dict(collections.Counter(reads))

    def test_checkpoint_resume_skips_done_shards(self, fastq, tmp_path):
        from shortseq_tpu.config import PipelineConfig
        from shortseq_tpu.count.checkpoint import completed_shards
        from shortseq_tpu.dist.pipeline import count_fastq_sharded
        from shortseq_tpu.io.native import get_lib

        if get_lib() is None:
            pytest.skip("byte-range sharding needs the native sharder")
        path, reads = fastq
        ckpt = tmp_path / "ckpt"
        cfg = PipelineConfig(checkpoint_dir=str(ckpt))

        table1 = count_fastq_sharded(path, n_shards=3, config=cfg)
        assert completed_shards(ckpt, 0) == {0, 1, 2}
        want = dict(collections.Counter(reads))
        assert _as_dict(table1) == want

        # Resume: all shards done, nothing recounted, same result.
        table2 = count_fastq_sharded(path, n_shards=3, config=cfg)
        assert _as_dict(table2) == want

    def test_checkpoint_tables_roundtrip(self, tmp_path, rng):
        import jax.numpy as jnp

        from shortseq_tpu.count import count_batch
        from shortseq_tpu.count.checkpoint import (load_table, merge_tables,
                                                   save_table)
        from shortseq_tpu.ops.bitpack import pack_words

        seqs_a = [rand_sequence(rng, 20) for _ in range(40)]
        seqs_b = seqs_a[:10] + [rand_sequence(rng, 20) for _ in range(30)]
        paths = []
        for i, seqs in enumerate([seqs_a, seqs_b]):
            mat = np.zeros((len(seqs), 32), np.uint8)
            lengths = np.full(len(seqs), 20, np.int32)
            for j, s in enumerate(seqs):
                mat[j, :20] = np.frombuffer(s.encode(), np.uint8)
            table = count_batch(pack_words(jnp.asarray(mat)),
                                jnp.asarray(lengths))
            p = tmp_path / f"t{i}.npz"
            save_table(p, *table)
            w, l, c = load_table(p)
            assert len(l) == len(set(seqs))
            paths.append(p)
        merged = merge_tables(paths)
        want = collections.Counter(seqs_a) + collections.Counter(seqs_b)
        assert _as_dict(merged) == dict(want)

    def test_batch_chunking(self, tmp_path, rng):
        # batch_size smaller than the shard forces the chunked path.
        from shortseq_tpu.config import PipelineConfig
        from shortseq_tpu.dist.pipeline import count_fastq_sharded

        reads = [rand_sequence(rng, 16) for _ in range(100)] * 2
        path = tmp_path / "c.fastq"
        _write_fastq(path, reads)
        cfg = PipelineConfig(batch_size=64, min_batch_pad=64)
        table = count_fastq_sharded(path, config=cfg)
        assert _as_dict(table) == dict(collections.Counter(reads))

    def test_distributed_entry_single_process(self, fastq):
        # n_hosts == 1 degenerates to count_fastq_sharded; the multi-host
        # merge branch needs a multi-controller run (pod slice) and is
        # exercised there.
        from shortseq_tpu.dist import read_and_count_fastq_distributed

        path, reads = fastq
        table = read_and_count_fastq_distributed(path)
        assert _as_dict(table) == dict(collections.Counter(reads))

    def test_partial_resume_recounts_only_missing(self, fastq, tmp_path):
        # Simulate a crash after some shards: delete one table, re-run, and
        # the result must still be exact (missing shard recounted, others
        # loaded from disk).
        from shortseq_tpu.config import PipelineConfig
        from shortseq_tpu.count.checkpoint import completed_shards, shard_path
        from shortseq_tpu.dist.pipeline import count_fastq_sharded
        from shortseq_tpu.io.native import get_lib

        if get_lib() is None:
            pytest.skip("needs native sharder")
        path, reads = fastq
        ckpt = tmp_path / "ckpt_partial"
        cfg = PipelineConfig(checkpoint_dir=str(ckpt))
        count_fastq_sharded(path, n_shards=4, config=cfg)
        assert completed_shards(ckpt, 0) == {0, 1, 2, 3}

        shard_path(ckpt, 0, 2).unlink()  # "crash" lost shard 2
        assert completed_shards(ckpt, 0) == {0, 1, 3}
        table = count_fastq_sharded(path, n_shards=4, config=cfg)
        assert completed_shards(ckpt, 0) == {0, 1, 2, 3}
        assert _as_dict(table) == dict(collections.Counter(reads))
