"""Regression tests for the core-module review findings: empty batches,
negative batch indexing, pad rows in the bucketed exchange, stale-word pad
groups, and checkpoint-manifest guards."""

import collections

import numpy as np
import pytest

from tests.conftest import rand_sequence


class TestEmptyBatches:
    def test_empty_batch_counts(self):
        from shortseq_tpu.batch import pack_batch

        assert dict(pack_batch([]).counts()) == {}

    def test_zero_row_unique_count(self):
        import jax.numpy as jnp

        from shortseq_tpu.count import unique_count
        from shortseq_tpu.count.device import counts_to_host

        table = unique_count(jnp.zeros((0, 2), jnp.uint32),
                             jnp.zeros((0,), jnp.int32),
                             jnp.zeros((0,), jnp.int32))
        assert int(table[3]) == 0
        assert counts_to_host(*table) == []

    def test_empty_slice_of_batch_counts(self):
        from shortseq_tpu.batch import pack_batch

        b = pack_batch(["ACGT", "TTTT"])[0:0]
        assert len(b) == 0
        assert dict(b.counts()) == {}


class TestBatchIndexing:
    def test_negative_index(self):
        from shortseq_tpu.batch import pack_batch

        b = pack_batch(["ACGT", "TTTT", "GGGG"])
        assert b[-1].decode() == ["GGGG"]
        assert b[-3].decode() == ["ACGT"]
        assert b[np.int64(1)].decode() == ["TTTT"]

    def test_out_of_range_raises(self):
        from shortseq_tpu.batch import pack_batch

        b = pack_batch(["ACGT"])
        with pytest.raises(IndexError):
            b[1]
        with pytest.raises(IndexError):
            b[-2]


class TestPadRows:
    def test_stale_word_pads_dont_inflate_n_unique(self):
        import jax.numpy as jnp

        from shortseq_tpu.count import unique_count
        from shortseq_tpu.count.device import PAD_LENGTH, counts_to_host

        # Dead rows carry DIFFERENT stale words (the docstring only
        # requires the length sentinel); they must collapse out entirely.
        words = jnp.asarray(np.array(
            [[1, 0], [1, 0], [7, 7], [9, 9], [5, 5]], np.uint32))
        lengths = jnp.asarray(np.array(
            [8, 8, PAD_LENGTH, PAD_LENGTH, PAD_LENGTH], np.int32))
        table = unique_count(words, lengths, jnp.ones(5, jnp.int32))
        assert int(table[3]) == 1
        [(key, count)] = counts_to_host(*table)
        assert count == 2 and key[0] == 8

    def test_bucketed_counter_ignores_pads(self):
        # Mostly-padded batches (power-of-two padding) must neither trip
        # the overflow flag nor consume exchange capacity.
        import subprocess
        import sys

        from tests.conftest import scrubbed_cpu_env

        script = """
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from shortseq_tpu.count.device import PAD_LENGTH, counts_to_host_scattered
from shortseq_tpu.dist import count_sharded_bucketed, data_mesh
from shortseq_tpu.ops.bitpack import pack_words

n, live = 1024, 8
mat = np.zeros((n, 32), np.uint8)
lengths = np.full(n, PAD_LENGTH, np.int32)
for i in range(live):
    mat[i, :4] = np.frombuffer(b"ACGT", np.uint8)
    lengths[i] = 4
words = pack_words(jnp.asarray(mat))
step = count_sharded_bucketed(data_mesh())
u_w, u_l, u_c, n_u, ov = step(words, jnp.asarray(lengths),
                              jnp.ones(n, jnp.int32))
assert int(ov) == 0, "pads tripped overflow"
table = dict(counts_to_host_scattered(u_w, u_l, u_c))
assert table == {(4, (180,)): live}, table
print("PADS-OK")
"""
        proc = subprocess.run([sys.executable, "-c", script],
                              env=scrubbed_cpu_env(8), capture_output=True,
                              text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "PADS-OK" in proc.stdout


class TestCheckpointManifest:
    def _write_fastq(self, path, reads):
        with open(path, "wb") as f:
            for i, r in enumerate(reads):
                f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n".encode())

    def test_mismatched_resume_refused(self, tmp_path, rng):
        from shortseq_tpu.config import PipelineConfig
        from shortseq_tpu.dist.pipeline import count_fastq_sharded
        from shortseq_tpu.io.native import get_lib

        if get_lib() is None:
            pytest.skip("needs native sharder")
        reads = [rand_sequence(rng, 20) for _ in range(50)]
        path = tmp_path / "a.fastq"
        self._write_fastq(path, reads)
        cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckpt"))
        count_fastq_sharded(path, n_shards=3, config=cfg)
        with pytest.raises(ValueError, match="clear the directory"):
            count_fastq_sharded(path, n_shards=5, config=cfg)

        other = tmp_path / "b.fastq"
        self._write_fastq(other, reads + [rand_sequence(rng, 20)])
        with pytest.raises(ValueError, match="clear the directory"):
            count_fastq_sharded(other, n_shards=3, config=cfg)
