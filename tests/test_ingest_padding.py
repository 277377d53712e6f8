"""quarter_pow2 batch padding: the closed compile-shape set with bounded
waste (count/ingest.py).  Pad rows ride the h2d transfer AND the sort on
the device count path, so pow2's worst case (+100%) was real time."""

import numpy as np
import pytest

from shortseq_tpu.count.ingest import packed_buckets, quarter_pow2


class TestQuarterPow2:
    @pytest.mark.parametrize("n,want", [
        (1, 256), (255, 256), (256, 256), (257, 320), (320, 320),
        (321, 384), (1 << 20, 1 << 20), ((1 << 20) + 1, 1310720),
        (10_000_000, 10_485_760), (16_777_216, 16_777_216),
    ])
    def test_exact_steps(self, n, want):
        got = quarter_pow2(n)
        assert got == want and got >= n

    def test_waste_bounded_and_monotone(self):
        rng = np.random.default_rng(0)
        prev = 0
        for n in sorted(int(x) for x in rng.integers(1, 1 << 24, size=500)):
            p = quarter_pow2(n)
            assert n <= p, n
            if n > 256:
                assert p < 1.25 * n + 1, (n, p)  # bounded 25% waste
            assert p >= prev  # monotone in n
            prev = p

    def test_shape_set_is_closed(self):
        # 4 shapes per octave: the persistent compile cache converges.
        shapes = {quarter_pow2(n) for n in range(1, 1 << 14)}
        import math

        octaves = math.log2((1 << 14) / 256)
        assert len(shapes) <= 4 * octaves + 2


def test_packed_buckets_quarter_mode():
    reads = [b"ACGT" * 2] * 300  # 300 rows -> quarter step 320
    data = b"".join(reads)
    starts = np.arange(300, dtype=np.int64) * 8
    lengths = np.full(300, 8, np.int32)
    [(words, sub_len)] = list(packed_buckets(
        data, starts, lengths, pad_pow2="quarter"))
    assert words.shape[0] == 320 == len(sub_len)
    from shortseq_tpu.count.device import PAD_LENGTH

    assert (sub_len[300:] == PAD_LENGTH).all()
    # pow2 mode unchanged
    [(w2, _)] = list(packed_buckets(data, starts, lengths, pad_pow2=True))
    assert w2.shape[0] == 512
