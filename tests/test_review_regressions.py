"""Regression tests for the core-module review findings: empty batches,
negative batch indexing, pad rows in the bucketed exchange, stale-word pad
groups, and checkpoint-manifest guards."""

import collections

import numpy as np
import pytest

from tests.conftest import rand_sequence, scrubbed_cpu_env


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


class TestSyncBounds:
    """ssq_fastq_sync must tolerate offsets at/past the end of the buffer
    (a byte_range hi of "very large" is the natural to-end-of-file call);
    previously the memchr count wrapped negative -> OOB read."""

    FASTQ = b"@r0\nACGT\n+\nIIII\n@r1\nTTTT\n+\nIIII\n"

    def test_native_sync_past_end(self):
        from shortseq_tpu.io.native import get_lib

        lib = get_lib()
        if lib is None:
            pytest.skip("native io library unavailable")
        n = len(self.FASTQ)
        for off in (n, n + 1, n + 1000, 10**12):
            assert lib.ssq_fastq_sync(self.FASTQ, n, off) == n
        # Python twin agrees.
        from shortseq_tpu.io.fastq import fastq_sync

        for off in (n, n + 1, n + 1000):
            assert fastq_sync(self.FASTQ, off) == n

    def test_read_range_to_huge_hi(self, tmp_path):
        from shortseq_tpu.io import read_fastq_matrix

        f = tmp_path / "r.fastq"
        f.write_bytes(self.FASTQ)
        mat, lengths = read_fastq_matrix(str(f), byte_range=(0, 10**12))
        assert len(lengths) == 2
        assert mat[0, :4].tobytes() == b"ACGT"


class TestBuildCacheRobustness:
    def test_corrupt_cached_so_degrades_and_heals(self, tmp_path, monkeypatch):
        """A truncated/garbage cached .so must make get_lib return None
        (numpy fallback) and remove the poisoned file so a later run
        rebuilds, instead of crashing every future import."""
        import os

        if os.environ.get("SHORTSEQ_TPU_FORCE_PYTHON") == "1":
            pytest.skip("native build disabled by SHORTSEQ_TPU_FORCE_PYTHON")
        import shortseq_tpu.io.native as nat

        if not nat._SRC.exists():
            pytest.skip("on-demand build needs csrc/ (installed package "
                        "uses the wheel's _fastq_index extension instead)")

        monkeypatch.setattr(nat, "_CACHE_DIR", tmp_path)
        monkeypatch.setattr(nat, "_lib", None)
        monkeypatch.setattr(nat, "_tried", False)
        # Force the on-demand build path: with a wheel-installed
        # _fastq_index extension present, _build would never consult the
        # cache this test poisons.
        monkeypatch.setattr(nat, "_installed_ext", lambda: None)
        # Plant garbage at the exact cache path _build computes.
        import hashlib

        from shortseq_tpu.native_build import isa_token

        src = nat._SRC.read_bytes()
        key = f"{hashlib.sha256(src).hexdigest()[:16]}_{isa_token()}"
        poisoned = tmp_path / f"libshortseq_io_{key}.so"
        poisoned.write_bytes(b"not an elf file")
        assert nat.get_lib() is None
        assert not poisoned.exists()  # dropped for the next run
        # A fresh attempt (new process semantics) rebuilds cleanly.
        monkeypatch.setattr(nat, "_tried", False)
        lib = nat.get_lib()
        if lib is not None:  # g++ available: full heal
            assert lib.ssq_count_lines(b"a\nb\n", 4) == 2


class TestUmiPackPadding:
    @pytest.mark.parametrize("n", [1, 3, 100, 129])
    def test_pack_validate_matrix_any_n(self, n):
        """Row-count pow2 padding must not change results (the pad rows are
        zero-length and sliced off)."""
        from shortseq_tpu.oracle import blocks_to_lanes, encode_bytes
        from shortseq_tpu.umi.dedup import _pack_validate_matrix

        rng = np.random.default_rng(n)
        lengths = rng.integers(1, 13, size=n).astype(np.int32)
        mat = np.zeros((n, 32), np.uint8)
        for i, l in enumerate(lengths):
            mat[i, :l] = np.frombuffer(
                bytes(rng.choice(list(b"ACGT"), size=l).astype(np.uint8)),
                np.uint8)
        words = np.asarray(_pack_validate_matrix(mat, lengths))
        assert words.shape[0] == n
        for i in (0, n - 1):
            want = blocks_to_lanes(
                encode_bytes(mat[i, :lengths[i]].tobytes()), words.shape[1])
            assert list(words[i]) == list(want)

    def test_pack_validate_matrix_invalid_raises(self):
        from shortseq_tpu.umi.dedup import _pack_validate_matrix

        mat = np.zeros((3, 32), np.uint8)
        mat[0, :4] = np.frombuffer(b"ACGT", np.uint8)
        mat[1, :4] = np.frombuffer(b"ACNT", np.uint8)
        mat[2, :4] = np.frombuffer(b"GGGG", np.uint8)
        with pytest.raises(Exception, match="Unsupported base character"):
            _pack_validate_matrix(mat, np.array([4, 4, 4], np.int32))


class TestPoisonedCountsPropagation:
    def test_table_to_host_raises_on_poisoned_count(self):
        """A wrapped (poisoned, -1) count must raise at the shard merge,
        not be silently re-merged into a plausible positive value."""
        import jax.numpy as jnp

        from shortseq_tpu.dist.pipeline import _table_to_host

        table = (jnp.zeros((4, 2), jnp.uint32),
                 jnp.array([4, 4, 2147483647, 2147483647], jnp.int32),
                 jnp.array([3, -1, 0, 0], jnp.int32), jnp.int32(2))
        with pytest.raises(OverflowError, match="int32"):
            _table_to_host(table)
        # numpy-tuple path too (table_to_counter's device_get route)
        with pytest.raises(OverflowError, match="int32"):
            _table_to_host((np.zeros((4, 2), np.uint32),
                            np.array([4, 4, 0, 0], np.int32),
                            np.array([3, -1, 0, 0], np.int32), 2))


class TestEmptyMergeSentinel:
    def test_empty_merge_rows_are_pad_sentinel(self):
        """The empty-table pad row must carry PAD_LENGTH, not length 0
        (a live value: the empty read) - sentinel-filtering consumers
        would emit a phantom key otherwise."""
        from shortseq_tpu.count.device import (PAD_LENGTH,
                                               counts_to_host_scattered)
        from shortseq_tpu.dist.pipeline import _merge_host_tables

        w, lens, c, n = _merge_host_tables([])
        assert int(n) == 0
        assert int(np.asarray(lens)[0]) == int(PAD_LENGTH)
        assert counts_to_host_scattered(w, lens, c) == []


class TestPackWidthContract:
    def test_non_multiple_of_4_lanes_raises(self):
        import jax.numpy as jnp

        from shortseq_tpu.ops.bitpack import pack_words_u32

        with pytest.raises(ValueError, match="multiple of 4"):
            pack_words_u32(jnp.zeros((2, 6), jnp.uint32))

    def test_from_matrix_pads_odd_width(self):
        """A 24-column byte matrix (multiple of 4, not of 16) must pack
        every nucleotide, not silently drop columns 17-24."""
        from shortseq_tpu.batch import PackedBatch, pack_batch

        seq = "ACGTACGTACGTACGTTGCATGCA"  # 24 nt
        mat = np.frombuffer(seq.encode(), np.uint8).reshape(1, 24)
        b = PackedBatch.from_matrix(mat, np.array([24], np.int32))
        assert b.decode() == [seq]
        ref = pack_batch([seq])
        assert b.hamming(ref).tolist() == [0]


class TestBucketedReplicatedPrefix:
    def test_replicated_bucketed_table_is_prefix_contiguous(self):
        """count_sharded_bucketed(replicate=True) must satisfy the same
        prefix contract as count_sharded: slicing [:n_unique] (what
        counts_to_host and pipeline._table_to_host do) must see every
        live row, not slab-0 padding."""
        import collections

        import jax

        if jax.device_count() < 2:
            pytest.skip("needs a multi-device mesh")
        import jax.numpy as jnp

        from shortseq_tpu.count.device import counts_to_host
        from shortseq_tpu.dist import count_sharded_bucketed, data_mesh
        from shortseq_tpu.ops.bitpack import pack_words

        rng = np.random.default_rng(7)
        seqs = ["".join(rng.choice(list("ACGT"), size=8)) for _ in range(16)]
        reads = [seqs[i] for i in rng.integers(0, 16, size=64)]
        mat = np.zeros((64, 16), np.uint8)
        for i, s in enumerate(reads):
            mat[i, :8] = np.frombuffer(s.encode(), np.uint8)
        words = pack_words(jnp.asarray(mat))
        lengths = jnp.full(64, 8, jnp.int32)
        step = count_sharded_bucketed(data_mesh())
        u_w, u_l, u_c, n_u, overflow = step(
            words, lengths, jnp.ones(64, jnp.int32))
        assert not bool(overflow)
        got = dict(counts_to_host(u_w, u_l, u_c, n_u))

        def key(s):
            from shortseq_tpu.oracle import encode_bytes
            return (len(s), tuple(encode_bytes(s.encode())))

        want = {key(s): c for s, c in
                collections.Counter(reads).items()}
        assert got == want


class TestTableMaterializationGuards:
    def test_length_beyond_lane_capacity_raises(self):
        from shortseq_tpu.api.counter import (ShortSeqCounter,
                                              update_counter_from_host_table)

        c = ShortSeqCounter()
        words = np.full((1, 2), 0xFFFFFFFF, np.uint32)  # 2 lanes = 32 nt max
        with pytest.raises(ValueError, match="capacity"):
            update_counter_from_host_table(
                c, words, np.array([40], np.int32), np.array([1], np.int32))

    def test_unsigned_counts_widen_exactly(self):
        from shortseq_tpu.api.counter import (ShortSeqCounter,
                                              update_counter_from_host_table)

        c = ShortSeqCounter()
        words = np.zeros((1, 2), np.uint32)
        words[0, 0] = 0b10010011  # ACGT? any packed word
        update_counter_from_host_table(
            c, words, np.array([4], np.int32),
            np.array([2**31], np.uint32))  # > int32 max, exact in int64
        [(key, count)] = list(c.items())
        assert count == 2**31

    def test_float_counts_rejected(self):
        from shortseq_tpu.api.counter import (ShortSeqCounter,
                                              update_counter_from_host_table)

        with pytest.raises(TypeError, match="integer"):
            update_counter_from_host_table(
                ShortSeqCounter(), np.zeros((1, 2), np.uint32),
                np.array([4], np.int32), np.array([1.0]))


class TestFromBlocksContract:
    def test_too_few_blocks_raises(self):
        import shortseq_tpu as sq
        from shortseq_tpu.api import from_blocks

        with pytest.raises(ValueError, match="blocks given"):
            from_blocks([0x1], 200)  # 200 nt needs 7 blocks

    def test_stray_high_bits_masked(self):
        """from_blocks([0xF], 1) must equal pack('G') (low 2 bits = code 3);
        unmasked stray bits would split Counter keys via hash/eq."""
        import shortseq_tpu as sq
        from shortseq_tpu.api import from_blocks

        s = from_blocks([0xF], 1)
        g = sq.pack("G")
        assert str(s) == "G"
        assert s == g and hash(s) == hash(g)

    def test_exact_blocks_round_trip(self):
        import shortseq_tpu as sq
        from shortseq_tpu.api import from_blocks
        from shortseq_tpu.oracle import encode_bytes

        seq = "ACGT" * 30  # 120 nt -> Var class, 4 blocks
        blocks = encode_bytes(seq.encode())
        s = from_blocks(blocks, len(seq))
        assert str(s) == seq and s == sq.pack(seq)


class TestReflectedXorParity:
    def test_int_xor_seq_message(self):
        import shortseq_tpu as sq

        s = sq.pack("ACGT")
        with pytest.raises(TypeError, match="incorrect type"):
            s ^ 5
        with pytest.raises(TypeError, match="incorrect type"):
            5 ^ s


class TestInvertedByteRange:
    def test_inverted_range_raises(self, tmp_path):
        from shortseq_tpu.io import read_fastq_matrix

        f = tmp_path / "r.fastq"
        f.write_bytes(b"@r0\nACGT\n+\nIIII\n" * 100)
        with pytest.raises(ValueError, match="inverted"):
            read_fastq_matrix(str(f), byte_range=(500, 100))


class TestDedupMatrixNoRetry:
    def test_matrix_path_not_retried_after_none(self, monkeypatch):
        """When the native library is missing the matrix fast path returns
        None; rebuilding the same matrix from the exploded bytes list and
        retrying is a guaranteed-futile O(N*L) pass."""
        import shortseq_tpu.umi.dedup as dd

        calls = {"n": 0}

        def fake_matrix(*a, **k):
            calls["n"] += 1
            return None

        monkeypatch.setattr(dd, "_dedup_umi_matrix", fake_matrix)
        mat = np.tile(np.frombuffer(b"AAAAACGT", np.uint8), (6, 1))
        labels, reps = dd.dedup_umis(mat, threshold=1, method="unique")
        assert calls["n"] == 1  # no second attempt
        assert len(labels) == 6 and reps == [b"AAAAACGT"]


class TestNamedScopeExceptionTransparency:
    def test_importerror_inside_block_propagates(self):
        from shortseq_tpu.utils.profiling import named_scope

        with pytest.raises(ImportError, match="no_such_module"):
            with named_scope("x"):
                raise ImportError("no_such_module")


class TestInitializeDistributedIdempotent:
    def test_double_init_message_tolerated(self, monkeypatch):
        """jax 0.9's double-init RuntimeError says 'should only be called
        once' (no 'already'); the guard must treat it as idempotent."""
        import jax

        from shortseq_tpu.dist import mesh

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:9999")

        def fake_init(**kw):
            raise RuntimeError("distributed.initialize should only be "
                               "called once.")

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        # Also defeat the global-state short-circuit so the message path
        # is what's under test.
        from jax._src import distributed as _dist

        monkeypatch.setattr(_dist.global_state, "client", None,
                            raising=False)
        mesh.initialize_distributed()  # must not raise

    def test_marker_env_forwards_address(self, monkeypatch):
        import jax

        from shortseq_tpu.dist import mesh

        seen = {}

        def fake_init(**kw):
            seen.update(kw)

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        from jax._src import distributed as _dist

        monkeypatch.setattr(_dist.global_state, "client", None,
                            raising=False)
        mesh.initialize_distributed()
        assert seen.get("coordinator_address") == "10.0.0.1:1234"


class TestCliErrorMessages:
    def test_count_invalid_base_clean_error(self, tmp_path):
        import subprocess
        import sys

        f = tmp_path / "n.fastq"
        f.write_bytes(b"@r0\nACGNT\n+\nIIIII\n")
        proc = subprocess.run(
            [sys.executable, "-m", "shortseq_tpu", "count", str(f)],
            capture_output=True, text=True, timeout=300,
            env=scrubbed_cpu_env())
        assert proc.returncode == 2, (proc.returncode, proc.stderr[-500:])
        assert "error: Unsupported base character" in proc.stderr
        assert "Traceback" not in proc.stderr

    def test_count_missing_file_clean_error(self):
        import subprocess
        import sys

        proc = subprocess.run(
            [sys.executable, "-m", "shortseq_tpu", "count", "/no/such.fastq"],
            capture_output=True, text=True, timeout=300,
            env=scrubbed_cpu_env())
        assert proc.returncode == 2
        assert proc.stderr.startswith("error:") or "\nerror:" in proc.stderr
