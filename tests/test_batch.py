"""PackedBatch - the batched device API - vs string oracles and the
scalar object layer."""

import collections

import numpy as np
import pytest

from tests.conftest import rand_sequence


@pytest.fixture
def seqs(rng):
    return [rand_sequence(rng, rng.randint(1, 60)) for _ in range(37)]


class TestPackedBatch:
    def test_roundtrip_decode(self, seqs):
        from shortseq_tpu.batch import pack_batch

        assert pack_batch(seqs).decode() == seqs

    def test_words_match_oracle(self, seqs):
        from shortseq_tpu import oracle
        from shortseq_tpu.batch import pack_batch

        b = pack_batch(seqs)
        words = np.asarray(b.words)
        for i, s in enumerate(seqs):
            lanes = oracle.blocks_to_lanes(
                oracle.encode_bytes(s.encode()), b.width_lanes)
            assert list(words[i]) == lanes

    def test_to_objects(self, seqs):
        import shortseq_tpu as sq
        from shortseq_tpu.batch import pack_batch

        objs = pack_batch(seqs).to_objects()
        for s, o in zip(seqs, objs):
            assert o == sq.pack(s)
            assert str(o) == s

    def test_to_objects_odd_lane_width(self):
        from shortseq_tpu.batch import pack_batch

        seqs = ["ACG" * 5, "T" * 16]  # width 16 -> one lane
        objs = pack_batch(seqs).to_objects()
        assert [str(o) for o in objs] == seqs

    def test_hamming_rows(self, rng):
        from shortseq_tpu.batch import pack_batch

        a = [rand_sequence(rng, 40) for _ in range(20)]
        b = [rand_sequence(rng, 40) for _ in range(20)]
        dist = np.asarray(pack_batch(a).hamming(pack_batch(b)))
        for i in range(20):
            assert dist[i] == sum(x != y for x, y in zip(a[i], b[i]))

    def test_hamming_length_mismatch_raises(self):
        from shortseq_tpu.batch import pack_batch

        with pytest.raises(Exception, match="equal length"):
            pack_batch(["ACGT"]).hamming(pack_batch(["ACG"]))

    def test_pairwise(self, rng):
        from shortseq_tpu.batch import pack_batch

        seqs = [rand_sequence(rng, 24) for _ in range(15)]
        d = np.asarray(pack_batch(seqs).pairwise())
        assert (np.diag(d) == 0).all()
        assert d[2, 7] == sum(x != y for x, y in zip(seqs[2], seqs[7]))

    def test_trim_matches_python_slice(self, rng):
        from shortseq_tpu.batch import pack_batch

        seqs = [rand_sequence(rng, rng.randint(10, 50)) for _ in range(25)]
        b = pack_batch(seqs).trim(5, 12)
        assert b.decode() == [s[5:17] for s in seqs]

    def test_trim_clamps_short_rows(self):
        from shortseq_tpu.batch import pack_batch

        b = pack_batch(["ACGTACGT", "ACG"]).trim(2, 4)
        assert b.decode() == ["GTAC", "G"]

    def test_trim_funnel_shift_fuzz(self, rng):
        # The packed-lane funnel shift vs the string oracle across lane
        # boundaries, ragged rows, and out-of-range starts.
        from shortseq_tpu.batch import pack_batch

        seqs = [rand_sequence(rng, rng.randint(0, 200)) for _ in range(48)]
        b = pack_batch(seqs)
        cases = [(0, 10), (3, 17), (16, 16), (5, 200), (33, 7),
                 (100, 50), (199, 10), (250, 5), (15, 1), (31, 33)]
        for start, length in cases:
            got = b.trim(start, length).decode()
            assert got == [s[start:start + length] for s in seqs], \
                (start, length)

    def test_trim_ragged_fuzz(self, rng):
        # Per-row dynamic starts/lengths vs the string oracle, and the
        # packed words must be CANONICAL (tail bits zero): re-packing the
        # sliced strings must reproduce them bit-for-bit.
        import numpy as np

        from shortseq_tpu.batch import PackedBatch, pack_batch

        seqs = [rand_sequence(rng, rng.randint(0, 200)) for _ in range(64)]
        b = pack_batch(seqs)
        for trial in range(6):
            starts = np.array([rng.randint(0, 210) for _ in seqs], np.int32)
            lengths = np.array([rng.randint(0, 210) for _ in seqs], np.int32)
            t = b.trim_ragged(starts, lengths)
            want = [s[st:st + ln] for s, st, ln in zip(seqs, starts, lengths)]
            assert t.decode() == want, trial
            canon = PackedBatch.from_seqs(want, width=b.width_lanes * 16)
            assert np.array_equal(np.asarray(t.words),
                                  np.asarray(canon.words)), trial
            assert np.array_equal(np.asarray(t.lengths),
                                  np.asarray(canon.lengths)), trial

    def test_trim_ragged_scalar_broadcast_and_out_width(self, rng):
        from shortseq_tpu.batch import pack_batch

        seqs = [rand_sequence(rng, rng.randint(5, 60)) for _ in range(16)]
        b = pack_batch(seqs)
        # Scalar broadcast must agree with static trim.
        assert b.trim_ragged(3, 12).decode() == b.trim(3, 12).decode()
        # Narrow output width caps the kept length at 16 * out_w nt.
        t = b.trim_ragged([1] * 16, [200] * 16, out_width_lanes=1)
        assert t.width_lanes == 1
        assert t.decode() == [s[1:1 + 200][:16] for s in seqs]

    def test_trim_rejects_negative(self):
        from shortseq_tpu.batch import pack_batch

        import pytest

        with pytest.raises(ValueError):
            pack_batch(["ACGT"]).trim(-1, 2)

    def test_counts(self, rng):
        from shortseq_tpu.batch import pack_batch

        seqs = [rand_sequence(rng, 20) for _ in range(30)]
        seqs += seqs[:12]
        counts = pack_batch(seqs).counts()
        want = collections.Counter(seqs)
        assert {str(k): v for k, v in counts.items()} == dict(want)

    def test_counts_odd_lane_width(self):
        # Regression: 1-lane batches (reads <= 16 nt) once produced garbage
        # keys in counts_to_host because lane pairing dropped the odd lane.
        from shortseq_tpu.batch import pack_batch

        counts = pack_batch(["ACGTACGT", "TTTTAAAA", "ACGTACGT"]).counts()
        assert {str(k): v for k, v in counts.items()} == {
            "ACGTACGT": 2, "TTTTAAAA": 1}

    def test_invalid_base_raises(self):
        from shortseq_tpu.batch import pack_batch

        with pytest.raises(Exception, match="Unsupported base character: N"):
            pack_batch(["ACGT", "ACNT"])

    def test_empty_batch(self):
        from shortseq_tpu.batch import pack_batch

        b = pack_batch([])
        assert len(b) == 0
        assert b.decode() == []

    def test_row_selection(self, seqs):
        from shortseq_tpu.batch import pack_batch

        b = pack_batch(seqs)
        assert b[3:7].decode() == seqs[3:7]
        assert b[5].decode() == [seqs[5]]

    def test_from_matrix_roundtrip(self, tmp_path, rng):
        from shortseq_tpu.batch import PackedBatch
        from shortseq_tpu.io.fastq import read_fastq_matrix

        reads = [rand_sequence(rng, rng.randint(8, 40)) for _ in range(50)]
        path = tmp_path / "t.fq"
        with open(path, "wb") as f:
            for i, r in enumerate(reads):
                f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n".encode())
        mat, lengths = read_fastq_matrix(path)
        assert PackedBatch.from_matrix(mat, lengths).decode() == reads
