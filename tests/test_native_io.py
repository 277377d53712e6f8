"""Native C++ FASTQ sharder vs the numpy parser and the pack oracle."""

import numpy as np
import pytest

from tests.conftest import rand_sequence


def _fastq_bytes(seqs, qual_at=False):
    """Synthesize a FASTQ file; quality lines optionally start with '@' to
    stress the record-sync heuristic."""
    recs = []
    for i, s in enumerate(seqs):
        q = ("@" if qual_at and i % 3 == 0 else "I") * len(s)
        recs.append(f"@read{i}\n{s}\n+\n{q}\n")
    return "".join(recs).encode()


@pytest.fixture(scope="module")
def lib():
    from shortseq_tpu.io.native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


class TestNativeFastq:
    def test_matrix_matches_numpy_parser(self, lib, rng, tmp_path):
        from shortseq_tpu.io.fastq import read_fastq_matrix
        from shortseq_tpu.io.native import fastq_matrix_native

        seqs = [rand_sequence(rng, rng.randint(1, 120)) for _ in range(257)]
        data = _fastq_bytes(seqs, qual_at=True)
        path = tmp_path / "t.fq"
        path.write_bytes(data)

        mat_np, len_np = read_fastq_matrix(path)
        mat_nat, len_nat = fastq_matrix_native(data)
        assert (len_np == len_nat).all()
        assert (mat_np == mat_nat).all()
        got = [bytes(mat_nat[i, :len_nat[i]]).decode() for i in range(len(seqs))]
        assert got == seqs

    def test_missing_final_newline(self, lib, rng):
        from shortseq_tpu.io.native import fastq_matrix_native

        seqs = ["ACGT", "TTTTA"]
        data = _fastq_bytes(seqs)[:-1]  # strip final newline; qual still parses
        mat, lengths = fastq_matrix_native(data)
        assert list(lengths) == [4, 5]
        assert bytes(mat[1, :5]) == b"TTTTA"

    def test_byte_range_sharding_covers_all_records(self, lib, rng):
        from shortseq_tpu.io.native import fastq_matrix_native

        seqs = [rand_sequence(rng, rng.randint(5, 40)) for _ in range(100)]
        data = _fastq_bytes(seqs, qual_at=True)
        n = len(data)
        n_shards = 4
        got = []
        for h in range(n_shards):
            r = (h * n // n_shards, (h + 1) * n // n_shards)
            mat, lengths = fastq_matrix_native(data, byte_range=r)
            got += [bytes(mat[i, :lengths[i]]).decode()
                    for i in range(len(lengths))]
        # Shards partition the records exactly: no loss, no duplication.
        assert got == seqs

    def test_pack_rows_matches_oracle(self, lib, rng):
        from shortseq_tpu import oracle
        from shortseq_tpu.io.native import pack_rows_native

        seqs = [rand_sequence(rng, rng.randint(1, 64)) for _ in range(64)]
        width = 64
        mat = np.zeros((len(seqs), width), dtype=np.uint8)
        lengths = np.zeros(len(seqs), dtype=np.int32)
        for i, s in enumerate(seqs):
            mat[i, :len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
            lengths[i] = len(s)
        words = pack_rows_native(mat, lengths)
        for i, s in enumerate(seqs):
            blocks = oracle.encode_bytes(s.encode())
            lanes = oracle.blocks_to_lanes(blocks, width // 16)
            assert list(words[i]) == lanes, s

    def test_pack_rows_rejects_bad_base(self, lib):
        from shortseq_tpu.io.native import pack_rows_native

        mat = np.zeros((2, 16), dtype=np.uint8)
        mat[0, :4] = np.frombuffer(b"ACGT", dtype=np.uint8)
        mat[1, :4] = np.frombuffer(b"ACNT", dtype=np.uint8)
        with pytest.raises(Exception, match="Unsupported base character"):
            pack_rows_native(mat, np.array([4, 4], dtype=np.int32))


def _force_python_io(monkeypatch):
    """Disable the native index/gather entry points so io.fastq exercises
    its numpy twins."""
    import shortseq_tpu.io.native as native

    monkeypatch.setattr(native, "fastq_index_native", lambda *a, **k: None)
    monkeypatch.setattr(native, "gather_pack_native", lambda *a, **k: None)


class TestGatherPack:
    """Fused index + gather + 2-bit pack (ssq_gather_pack and its numpy
    twin) vs the bit-level oracle."""

    def _index(self, data, tmp_path, byte_range=None):
        from shortseq_tpu.io.fastq import read_fastq_index

        path = tmp_path / "gp.fq"
        path.write_bytes(data)
        return read_fastq_index(path, byte_range=byte_range)

    def test_index_matches_matrix_parser(self, lib, rng, tmp_path):
        from shortseq_tpu.io.fastq import read_fastq_matrix

        seqs = [rand_sequence(rng, rng.randint(1, 120)) for _ in range(257)]
        data = _fastq_bytes(seqs, qual_at=True)
        buf, starts, lengths = self._index(data, tmp_path)
        path = tmp_path / "gp.fq"
        mat, len_ref = read_fastq_matrix(path)
        assert (lengths == len_ref).all()
        got = [buf[starts[i]:starts[i] + lengths[i]].decode()
               for i in range(len(seqs))]
        assert got == seqs

    def test_gather_pack_matches_oracle(self, lib, rng, tmp_path):
        from shortseq_tpu import oracle
        from shortseq_tpu.io.fastq import gather_pack

        seqs = [rand_sequence(rng, length)
                for length in list(range(1, 97)) * 2]
        data = _fastq_bytes(seqs, qual_at=True)
        buf, starts, lengths = self._index(data, tmp_path)
        for width in (32, 96):
            words = gather_pack(buf, starts, lengths, width)
            for i, s in enumerate(seqs):
                blocks = oracle.encode_bytes(s[:width].encode())
                lanes = oracle.blocks_to_lanes(blocks, width // 16)
                assert list(words[i]) == lanes, (width, s)

    def test_numpy_twin_bit_identical(self, lib, rng, tmp_path, monkeypatch):
        from shortseq_tpu.io.fastq import gather_pack

        seqs = [rand_sequence(rng, rng.randint(1, 40)) for _ in range(300)]
        data = _fastq_bytes(seqs)
        buf, starts, lengths = self._index(data, tmp_path)
        native_words = gather_pack(buf, starts, lengths, 48)
        _force_python_io(monkeypatch)
        py_words = gather_pack(buf, starts, lengths, 48)
        assert (native_words == py_words).all()

    def test_validation_sweep_all_bytes(self, lib, monkeypatch):
        """Native and numpy gather_pack agree with the scalar bloom oracle
        on every possible byte value (VERDICT r1 item 4's contract extended
        to the fused path)."""
        from shortseq_tpu import oracle
        from shortseq_tpu.io.fastq import gather_pack
        from shortseq_tpu.io.native import gather_pack_native

        data = bytes(range(256))
        for fn in (lambda i: gather_pack_native(
                       data, np.array([i], np.int64),
                       np.array([1], np.int32), 16),
                   lambda i: gather_pack(
                       data, np.array([i], np.int64),
                       np.array([1], np.int32), 16)):
            accepted = []
            for i in range(256):
                try:
                    fn(i)
                    accepted.append(i)
                except Exception:
                    pass
            expected = [c for c in range(256) if oracle.is_base(c)]
            assert accepted == expected
            _force_python_io(monkeypatch)  # second iteration: numpy twin

    def test_sharded_index_partitions_records(self, lib, rng, tmp_path):
        from shortseq_tpu.io.fastq import read_fastq_index

        seqs = [rand_sequence(rng, rng.randint(5, 40)) for _ in range(100)]
        data = _fastq_bytes(seqs, qual_at=True)
        path = tmp_path / "gp.fq"
        path.write_bytes(data)
        n = len(data)
        got = []
        for h in range(4):
            r = (h * n // 4, (h + 1) * n // 4)
            buf, starts, lengths = read_fastq_index(path, byte_range=r)
            got += [buf[starts[i]:starts[i] + lengths[i]].decode()
                    for i in range(len(lengths))]
        assert got == seqs

    def test_width_truncation_and_zero_pad(self, lib, tmp_path):
        from shortseq_tpu import oracle
        from shortseq_tpu.io.fastq import gather_pack

        seqs = ["A" * 40 + "G" * 8, "C"]
        data = _fastq_bytes(seqs)
        buf, starts, lengths = self._index(data, tmp_path)
        words = gather_pack(buf, starts, lengths, 32)
        # Row 0 truncates to its first 32 nt; row 1 zero-pads past 1 nt.
        blocks = oracle.encode_bytes(b"A" * 32)
        assert list(words[0]) == oracle.blocks_to_lanes(blocks, 2)
        blocks = oracle.encode_bytes(b"C")
        assert list(words[1]) == oracle.blocks_to_lanes(blocks, 2)


class TestHostCountInverse:
    @pytest.mark.parametrize("n", [100, 16384, 16385, 130_000])
    def test_inverse_contract(self, lib, n):
        # ssq_host_count_inv must satisfy the np.unique(return_inverse)
        # contract across the single-thread/threaded boundary (16384) and
        # through table growth + the partition-offset fixup.
        import numpy as np

        from shortseq_tpu.io.native import host_count_native

        rng = np.random.default_rng(n)
        pool = rng.integers(0, 2**32, size=(max(10, n // 20), 3),
                            dtype=np.uint64).astype(np.uint32)
        words = pool[rng.integers(0, len(pool), size=n)]
        lengths = np.full(n, 24, np.int32)
        uw, ul, uc, inv = host_count_native(words, lengths,
                                            return_inverse=True)
        assert uc.sum() == n
        assert (uw[inv] == words).all()
        assert (np.bincount(inv, minlength=len(uw)) == uc).all()
        # Counts and table agree with the no-inverse entry point.
        uw2, ul2, uc2 = host_count_native(words, lengths)
        assert (uw2 == uw).all() and (uc2 == uc).all()

    def test_inverse_mixed_lengths(self, lib):
        # Same words, different lengths are distinct keys.
        import numpy as np

        from shortseq_tpu.io.native import host_count_native

        words = np.zeros((6, 2), np.uint32)
        lengths = np.array([4, 8, 4, 8, 4, 12], np.int32)
        uw, ul, uc, inv = host_count_native(words, lengths,
                                            return_inverse=True)
        assert len(uc) == 3
        assert (ul[inv] == lengths).all()
