"""ShortSeqCounter and FASTQ pipeline tests (reference counter.pyx /
fast_read.pyx semantics; count-multiset parity per
unit_tests_profiling.py:136)."""

import collections
import random

import pytest

import shortseq_tpu as sq
from shortseq_tpu.io.fastq import read_fastq_lines, read_fastq_matrix


@pytest.fixture
def rng():
    return random.Random(99)


def rand_read(rng, lo=15, hi=32):
    return "".join(rng.choice("ACTG") for _ in range(rng.randint(lo, hi)))


def write_fastq(path, reads):
    with open(path, "wb") as f:
        for i, r in enumerate(reads):
            f.write(f"@read{i}\n{r}\n+\n{'I' * len(r)}\n".encode())


class TestCounter:
    def test_bytes_list_ingest(self, rng):
        reads = [rand_read(rng).encode() for _ in range(500)]
        counts = sq.ShortSeqCounter(reads)
        oracle = collections.Counter(reads)
        assert sum(counts.values()) == 500
        assert sorted(counts.values()) == sorted(oracle.values())
        for k, v in counts.items():
            assert oracle[str(k).encode()] == v

    def test_key_type_restriction(self):
        c = sq.ShortSeqCounter()
        with pytest.raises(TypeError, match="does not support"):
            c["ACGT"] = 1
        with pytest.raises(TypeError, match="does not support"):
            c[b"ACGT"] = 1
        c[sq.pack("ACGT")] = 3
        assert c[sq.pack("ACGT")] == 3

    def test_counter_eq_plain_dict(self):
        counts = sq.ShortSeqCounter([b"ATGC"] * 10)
        assert counts == {sq.pack("ATGC"): 10}

    def test_mixed_width_keys(self, rng):
        reads = ([rand_read(rng, 5, 30).encode() for _ in range(100)]
                 + [rand_read(rng, 40, 90).encode() for _ in range(100)]
                 + [rand_read(rng, 100, 300).encode() for _ in range(50)])
        counts = sq.ShortSeqCounter(reads)
        oracle = collections.Counter(reads)
        assert len(counts) == len(oracle)
        assert sorted(counts.values()) == sorted(oracle.values())


class TestFastq:
    def test_line_extraction(self, tmp_path, rng):
        reads = [rand_read(rng) for _ in range(100)]
        path = tmp_path / "t.fastq"
        write_fastq(path, reads)
        lines = read_fastq_lines(path)
        assert [l.decode() for l in lines] == reads

    def test_matrix(self, tmp_path, rng):
        reads = [rand_read(rng, 5, 60) for _ in range(100)]
        path = tmp_path / "t.fastq"
        write_fastq(path, reads)
        mat, lengths = read_fastq_matrix(path)
        assert mat.shape[0] == 100
        assert mat.shape[1] % 16 == 0
        from shortseq_tpu.constants import PAD_BYTE

        for i, r in enumerate(reads):
            assert lengths[i] == len(r)
            assert mat[i, : len(r)].tobytes() == r.encode()
            # Tail bytes are PAD_BYTE (bloom-passing, code-0): the device
            # fused pack+validate skips length masking on these matrices
            # (ops/bitpack.py pad_valid contract).
            assert (mat[i, len(r):] == PAD_BYTE).all()

    def test_missing_final_newline(self, tmp_path):
        path = tmp_path / "t.fastq"
        with open(path, "wb") as f:
            f.write(b"@r0\nACGT\n+\nIIII\n@r1\nGGCC\n+\nIIII")  # no trailing \n
        assert read_fastq_lines(path) == [b"ACGT", b"GGCC"]
        mat, lengths = read_fastq_matrix(path)
        assert list(lengths) == [4, 4]
        assert mat[1, :4].tobytes() == b"GGCC"

    def test_read_and_count(self, tmp_path, rng, capsys):
        reads = [rand_read(rng) for _ in range(200)] * 2
        path = tmp_path / "t.fastq"
        write_fastq(path, reads)
        counts = sq.read_and_count_fastq(str(path))
        oracle = collections.Counter(reads)
        assert sum(counts.values()) == 400
        assert sorted(counts.values()) == sorted(oracle.values())
        out = capsys.readouterr().out
        assert "total seqs" in out and "unique sequences" in out

    def test_empty_file(self, tmp_path):
        path = tmp_path / "empty.fastq"
        path.write_bytes(b"")
        assert read_fastq_lines(path) == []
        mat, lengths = read_fastq_matrix(path)
        assert mat.shape[0] == 0 and len(lengths) == 0


class TestDeviceCountPipeline:
    def test_mixed_width_fastq_exact_keys(self, tmp_path, rng):
        reads = ([rand_read(rng, 1, 32) for _ in range(80)]
                 + [rand_read(rng, 33, 96) for _ in range(60)]
                 + [rand_read(rng, 97, 200) for _ in range(30)])
        reads = reads + reads[::2]
        path = tmp_path / "mixed.fastq"
        write_fastq(path, reads)
        counts = sq.read_and_count_fastq(str(path))
        oracle = collections.Counter(reads)
        assert {str(k): v for k, v in counts.items()} == dict(oracle)
        # Keys are real ShortSeq objects of the right width class.
        for k in counts:
            if len(k) <= 32:
                assert type(k) is sq.ShortSeq64
            elif len(k) <= 96:
                assert type(k) is sq.ShortSeq192
            else:
                assert type(k) is sq.ShortSeqVar
        # And equal to independently packed objects (hash/eq parity).
        for r in set(reads):
            assert counts[sq.pack(r)] == oracle[r]

    def test_invalid_base_raises(self, tmp_path):
        path = tmp_path / "bad.fastq"
        with open(path, "wb") as f:
            f.write(b"@r0\nACGT\n+\nIIII\n@r1\nACNT\n+\nIIII\n")
        with pytest.raises(Exception, match="Unsupported base character"):
            sq.read_and_count_fastq(str(path))


class TestCountEngines:
    """read_and_count_fastq's host/device engines produce identical
    Counters (engine choice is a transport decision, never a semantic
    one)."""

    def _mixed_file(self, tmp_path, rng):
        reads = ([rand_read(rng, 1, 32) for _ in range(120)]
                 + [rand_read(rng, 33, 96) for _ in range(40)]
                 + [rand_read(rng, 97, 200) for _ in range(20)])
        reads = reads + reads[::3]
        path = tmp_path / "engines.fastq"
        write_fastq(path, reads)
        return path, reads

    def test_host_equals_device(self, tmp_path, rng):
        from shortseq_tpu.io.native import get_lib

        if get_lib() is None:
            pytest.skip("native library unavailable")
        path, reads = self._mixed_file(tmp_path, rng)
        host = sq.read_and_count_fastq(str(path), engine="host")
        device = sq.read_and_count_fastq(str(path), engine="device")
        assert host == device
        assert {str(k): v for k, v in host.items()} == \
            dict(collections.Counter(reads))

    def test_device_engine_streaming_chunks(self, tmp_path, rng):
        """The chunked device ingest (batch_size smaller than the file, so
        several device_put'd chunks concatenate into one per-bucket sort)
        must produce the same table as the oracle."""
        from shortseq_tpu.api.counter import count_indexed_device
        from shortseq_tpu.io.fastq import read_fastq_index

        path, reads = self._mixed_file(tmp_path, rng)
        data, starts, lengths = read_fastq_index(str(path))
        counts = count_indexed_device(data, starts, lengths, batch_size=64)
        oracle = collections.Counter(reads)
        assert {str(k): v for k, v in counts.items()} == dict(oracle)

    def test_device_engine_h2d_chunked_pipeline(self, tmp_path, rng,
                                                monkeypatch):
        """The overlapped-h2d path (4 fixed-shape chunks + associative
        on-device merge; counter._h2d_chunks) must produce the identical
        table.  The threshold is forced down so a small file exercises
        it."""
        from shortseq_tpu.api.counter import count_indexed_device
        from shortseq_tpu.io.fastq import read_fastq_index

        monkeypatch.setenv("SHORTSEQ_TPU_H2D_CHUNK_ROWS", "256")
        path, reads = self._mixed_file(tmp_path, rng)
        data, starts, lengths = read_fastq_index(str(path))
        counts = count_indexed_device(data, starts, lengths)
        assert {str(k): v for k, v in counts.items()} == \
            dict(collections.Counter(reads))

    def test_fetch_table_prefix(self):
        """fetch_table returns exactly the live prefix, for n_unique around
        the 256 / power-of-two slice-bucket edges."""
        import jax.numpy as jnp
        import numpy as np

        from shortseq_tpu.count.device import fetch_table, unique_count

        for n_unique in (1, 255, 256, 257, 300):
            n = 1024
            words = (np.arange(n, dtype=np.uint32) % n_unique).reshape(n, 1)
            lengths = np.full(n, 16, np.int32)
            t = unique_count(jnp.asarray(words), jnp.asarray(lengths),
                             jnp.ones(n, jnp.int32))
            w, lens, cnts, m = fetch_table(*t)
            assert m == n_unique
            assert w.shape == (n_unique, 1)
            assert (w[:, 0] == np.arange(n_unique)).all()
            assert int(cnts.sum()) == n

    def test_host_count_native_parity(self, rng):
        import numpy as np

        from shortseq_tpu.io.native import host_count_native

        if host_count_native(np.zeros((0, 2), np.uint32),
                             np.zeros(0, np.int32)) is None:
            pytest.skip("native library unavailable")
        nrng = np.random.default_rng(3)
        uniq = nrng.integers(0, 2**32, size=(700, 3), dtype=np.uint32)
        ulen = nrng.integers(0, 49, size=700).astype(np.int32)
        pick = nrng.integers(0, 700, size=20000)
        u_w, u_l, u_c = host_count_native(uniq[pick], ulen[pick])
        ref = collections.Counter(
            (int(l), tuple(map(int, w)))
            for w, l in zip(uniq[pick], ulen[pick]))
        got = {(int(l), tuple(map(int, w))): int(c)
               for w, l, c in zip(u_w, u_l, u_c)}
        assert got == dict(ref)
        assert int(u_c.sum()) == 20000

    def test_unknown_engine_raises(self, tmp_path, rng):
        path, _ = self._mixed_file(tmp_path, rng)
        with pytest.raises(ValueError, match="unknown engine"):
            sq.read_and_count_fastq(str(path), engine="gpu")

    def test_host_engine_requires_native(self, tmp_path, rng, monkeypatch):
        import shortseq_tpu.api.counter as counter_mod

        path, _ = self._mixed_file(tmp_path, rng)
        monkeypatch.setattr(counter_mod, "count_indexed_host_table",
                            lambda *a: None)
        with pytest.raises(RuntimeError, match="native library"):
            sq.read_and_count_fastq(str(path), engine="host")

    def test_gzip_fastq_transparent(self, tmp_path, rng):
        """.fastq.gz counts identically to the plain file (magic-byte
        detection; a capability the reference's getline reader lacks)."""
        import gzip

        reads = [rand_read(rng) for _ in range(300)] * 2
        plain = tmp_path / "t.fastq"
        write_fastq(plain, reads)
        gz = tmp_path / "t.fastq.gz"
        gz.write_bytes(gzip.compress(plain.read_bytes()))
        assert sq.read_and_count_fastq(str(gz)) == \
            sq.read_and_count_fastq(str(plain))

    def test_gzip_rejects_byte_range_sharding(self, tmp_path, rng):
        import gzip

        from shortseq_tpu.io.fastq import read_fastq_index

        plain = tmp_path / "t.fastq"
        write_fastq(plain, [rand_read(rng) for _ in range(50)])
        gz = tmp_path / "t.fastq.gz"
        gz.write_bytes(gzip.compress(plain.read_bytes()))
        with pytest.raises(ValueError, match="random access"):
            read_fastq_index(str(gz), byte_range=(0, 100))
        # Single-shard pipeline runs still work on gzip.
        from shortseq_tpu.dist.pipeline import (count_fastq_sharded,
                                                table_to_counter)
        table = count_fastq_sharded(str(gz), n_shards=1)
        assert table_to_counter(table) == sq.read_and_count_fastq(str(plain))

    def test_empty_read_counts_as_empty_singleton(self, tmp_path):
        path = tmp_path / "empty_read.fastq"
        with open(path, "wb") as f:
            f.write(b"@r0\n\n+\n\n@r1\nACGT\n+\nIIII\n@r2\n\n+\n\n")
        counts = sq.read_and_count_fastq(str(path))
        assert counts[sq.pack("")] == 2
        assert counts[sq.pack("ACGT")] == 1
