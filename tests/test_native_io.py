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
